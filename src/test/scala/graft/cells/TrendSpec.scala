package graft.cells

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Brute-force parity for the per-cell Mann–Kendall trend statistic. */
class TrendSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("trend-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(events: Seq[(Long, Long, Long)])
      : Map[(Long, Long), (Long, Long, String)] = {
    val s = spark
    import s.implicits._
    val df = events.toDF("cx", "cy", "day").repartition(3)
    val got = Trend.mannKendall(df, "cx", "cy", "day").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    graft.spark.PersistTracker.drain()
    got
  }

  private def brute(events: Seq[(Long, Long, Long)])
      : Map[(Long, Long), (Long, Long, String)] =
    events.groupBy(e => (e._1, e._2)).map { case (cell, es) =>
      val daily = es.groupBy(_._3).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val s = (for (i <- daily.indices; j <- i + 1 until daily.size)
        yield java.lang.Long.signum(daily(j)._2 - daily(i)._2).toLong).sum
      cell -> ((daily.size.toLong, s,
        if (s > 0) "inc" else if (s < 0) "dec" else "flat"))
    }

  test("mannKendall: strictly rising counts give S = n(n-1)/2, falling " +
       "the negative, constant flat") {
    // cell (0,0): counts 1,2,3 rising; (1,1): 3,2,1 falling; (2,2): 2,2
    val ev = (1 to 1).map(_ => (0L, 0L, 10L)) ++
      (1 to 2).map(_ => (0L, 0L, 11L)) ++ (1 to 3).map(_ => (0L, 0L, 12L)) ++
      (1 to 3).map(_ => (1L, 1L, 10L)) ++ (1 to 2).map(_ => (1L, 1L, 11L)) ++
      (1 to 1).map(_ => (1L, 1L, 12L)) ++
      (1 to 2).map(_ => (2L, 2L, 10L)) ++ (1 to 2).map(_ => (2L, 2L, 12L))
    val got = run(ev)
    assert(got === brute(ev))
    assert(got((0L, 0L)) === ((3L, 3L, "inc")))
    assert(got((1L, 1L)) === ((3L, -3L, "dec")))
    assert(got((2L, 2L)) === ((2L, 0L, "flat")))
  }

  test("mannKendall: irregular counts match brute force; single-day " +
       "cell is flat with zero pairs") {
    val rnd = new scala.util.Random(11)
    val ev = (for (_ <- 1 to 200) yield
      (rnd.nextInt(3).toLong, rnd.nextInt(3).toLong,
        (10 + rnd.nextInt(6)).toLong)) :+ ((9L, 9L, 42L))
    val got = run(ev)
    assert(got === brute(ev))
    assert(got((9L, 9L)) === ((1L, 0L, "flat")))
  }
}
