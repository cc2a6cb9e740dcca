package graft.cells

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Brute-force parity for the round-5ab spatial statistics: grid-density
  * clustering (Density), Ripley's K (RipleyK), LISA quadrants
  * (Autocorr.localMorans) and smoothed KL (Inequality.klSmoothed). */
class DensityRipleySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("density-ripley-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("Density.clusters: two diagonal-linked blobs merge, an isolated " +
       "blob stays separate, sparse cells drop") {
    val s = spark
    import s.implicits._
    // blob A: cells (0,0),(1,1) — diagonal contact, queen-adjacent;
    // blob B: cell (4,4) isolated; cell (7,7) has 2 pts < minPts
    val pts = (Seq.fill(3)((0L, 0L)) ++ Seq.fill(4)((1L, 1L)) ++
      Seq.fill(5)((4L, 4L)) ++ Seq.fill(2)((7L, 7L)))
      .toDF("cx", "cy").repartition(3)
    val got = Density.clusters(pts, "cx", "cy", ncols = 8, minPts = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    graft.spark.PersistTracker.drain()
    // cluster ids are the min member cell id (cy*8+cx): A = 0, B = 36
    assert(got === Set((0L, 2L, 7L), (36L, 1L, 5L)))
  }

  test("Density.clusters: a snake of dense cells is ONE component " +
       "(transitivity through star-contraction)") {
    val s = spark
    import s.implicits._
    val snake = Seq((0L, 0L), (1L, 0L), (2L, 0L), (2L, 1L), (2L, 2L),
      (3L, 3L)) // last joins diagonally
    val pts = snake.flatMap(c => Seq.fill(3)(c)).toDF("cx", "cy")
    val got = Density.clusters(pts, "cx", "cy", 8, 3L).collect()
    graft.spark.PersistTracker.drain()
    assert(got.length === 1)
    assert(got(0).getLong(0) === 0L) // min cell id
    assert(got(0).getLong(1) === 6L)
    assert(got(0).getLong(2) === 18L)
  }

  test("RipleyK: pair counts match brute force, boundary d = r counts, " +
       "cross-bucket pairs found") {
    val s = spark
    import s.implicits._
    // points straddling bucket borders of maxR=10: (9,0)-(11,0) d=2;
    // (0,0)-(10,0) d=10 exactly = r; (0,0)-(0,21) d=21 > 10 in no radius
    val pts = Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 9L, 5L),
      (4L, 11L, 5L), (5L, 0L, 21L)).toDF("id", "x", "y")
    val got = RipleyK.k(pts, "id", "x", "y", radii = Seq(5L, 10L),
        maxR = 10L, area = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    graft.spark.PersistTracker.drain()
    def brute(r: Long): Long = {
      val p = Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 9L, 5L),
        (4L, 11L, 5L), (5L, 0L, 21L))
      (for (a <- p; b <- p if a._1 < b._1;
        d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
        if d2 <= r * r) yield 1).size.toLong
    }
    assert(got(5L)._1 === brute(5L))   // (3,4) d=2; (2,3) d²=26>25 out
    assert(got(10L)._1 === brute(10L)) // includes the exact d=10 pair
    assert(got(10L)._2 ===
      1000000L * 100L * 2L * brute(10L) / (5L * 4L))
  }

  test("localMorans: deviations sum to zero, quadrants follow signs, " +
       "hot and cold spots land where planted") {
    val s = spark
    import s.implicits._
    // mass concentrated at (0..1)² of a 4×4 grid → HH there, LL far away
    val pts = (for (x <- 0 to 1; y <- 0 to 1; _ <- 1 to 6)
      yield (x.toLong, y.toLong)).toDF("cx", "cy")
    val rows = Autocorr.localMorans(pts, "cx", "cy", 4, 4).collect()
    graft.spark.PersistTracker.drain()
    assert(rows.length === 16)
    assert(rows.map(_.getAs[Long]("d")).sum === 0L)
    val byCell = rows.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(byCell((0L, 0L)).getAs[String]("quad") === "HH")
    assert(byCell((3L, 3L)).getAs[String]("quad") === "LL")
    // every row's quadrant is consistent with its own signs
    rows.foreach { r =>
      val (d, lag, q) = (r.getAs[Long]("d"), r.getAs[Long]("lag"),
        r.getAs[String]("quad"))
      val want = if (d > 0 && lag > 0) "HH" else if (d < 0 && lag < 0) "LL"
        else if (d > 0 && lag < 0) "HL" else if (d < 0 && lag > 0) "LH"
        else "NS"
      assert(q === want)
      assert(r.getDecimal(4).longValueExact() === d * lag)
    }
  }

  test("klSmoothed: identical slices give ~0; a shifted slice is " +
       "positive and matches the double reference within quantization") {
    val s = spark
    import s.implicits._
    val a = Seq("x", "x", "x", "y", "y", "z")
    val b = Seq("x", "y", "y", "y", "z", "z", "z", "z")
    val df = (a.map((_, 0)) ++ b.map((_, 1))).toDF("w", "slice")
    val got = graft.text.Inequality.klSmoothed(df, "w", "slice")
      .collect()(0)
    val v = 3L; val n1 = a.size.toLong; val n2 = b.size.toLong
    assert(got.getAs[Long]("v_size") === v)
    val terms = Seq("x", "y", "z").map { w =>
      val c1 = a.count(_ == w); val c2 = b.count(_ == w)
      val lr = math.round(math.log(
        (c1 + 1.0) * (n2 + v) / ((c2 + 1.0) * (n1 + v))) * 1e6)
      (c1 + 1L) * lr
    }
    assert(got.getAs[Long]("kl_micro") === terms.sum / (n1 + v))
    val same = (a.map((_, 0)) ++ a.map((_, 1))).toDF("w", "slice")
    assert(graft.text.Inequality.klSmoothed(same, "w", "slice")
      .collect()(0).getAs[Long]("kl_micro") === 0L)
  }
}
