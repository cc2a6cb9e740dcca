package graft.cells

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Brute-force / closed-form checks for Knox, Theil, and columnStats. */
class KnoxAnalyzeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("knox-analyze-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("knox: all four pair counts match brute force, incl. exact-" +
       "boundary distance and day gaps across bucket borders") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val pts = (1 to 60).map(i => (i.toLong, rnd.nextInt(40).toLong,
      rnd.nextInt(40).toLong, rnd.nextInt(6).toLong))
    val got = RipleyK.knox(pts.toDF("id", "x", "y", "day"),
      "id", "x", "y", "day", r = 10L, tau = 1L, maxR = 10L).collect()(0)
    graft.spark.PersistTracker.drain()
    val pairs = for (a <- pts; b <- pts if a._1 < b._1) yield {
      val d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      (d2 <= 100L, math.abs(a._4 - b._4) <= 1L)
    }
    val ns = pairs.count(_._1).toLong
    val nt = pairs.count(_._2).toLong
    val nst = pairs.count(p => p._1 && p._2).toLong
    assert(got.getAs[Long]("n_points") === 60L)
    assert(got.getAs[Long]("n_pairs") === 60L * 59L / 2L)
    assert(got.getAs[Long]("n_s") === ns)
    assert(got.getAs[Long]("n_t") === nt)
    assert(got.getAs[Long]("n_st") === nst)
    assert(got.getAs[Long]("ratio_e6") ===
      (BigInt(1000000) * nst * (60L * 59L / 2L) / (BigInt(ns) * nt))
        .toLong)
  }

  test("theilByGroup: uniform entities give 0 everywhere; skewed counts " +
       "match the double reference after quantization") {
    val s = spark
    import s.implicits._
    // two groups: g0 hosts {a:4, b:4}, g1 hosts {c:2, d:6}
    val rows = Seq.fill(4)(("g0", "a")) ++ Seq.fill(4)(("g0", "b")) ++
      Seq.fill(2)(("g1", "c")) ++ Seq.fill(6)(("g1", "d"))
    val got = graft.text.Inequality
      .theilByGroup(rows.toDF("g", "k"), "k", "g")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    graft.spark.PersistTracker.drain()
    def brute(xs: Seq[Long]): Long = {
      val n = xs.size; val xt = xs.sum
      xs.map(x => x * math.round(math.log(n.toDouble * x / xt) * 1e6))
        .sum / xt
    }
    assert(got("g0") === ((2L, 8L, brute(Seq(4L, 4L)))))
    assert(got("g0")._3 === 0L)                  // uniform within g0
    assert(got("g1") === ((2L, 8L, brute(Seq(2L, 6L)))))
    assert(got("g1")._3 > 0L)
    assert(got("__between") === ((2L, 16L, brute(Seq(8L, 8L)))))
    assert(got("__between")._3 === 0L)           // equal group totals
    assert(got("__total") === ((4L, 16L, brute(Seq(4L, 4L, 2L, 6L)))))
  }

  test("columnStats: nulls counted, ndv excludes nulls, min/max " +
       "rendered as strings") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option("b")), (2L, Option("a")), (2L, None),
      (5L, Option("a"))).toDF("id", "tag")
    val got = graft.table.Analyze.columnStats(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    assert(got("id") === ((4L, 0L, 3L, "1", "5")))
    assert(got("tag") === ((4L, 1L, 2L, "a", "b")))
  }
}
