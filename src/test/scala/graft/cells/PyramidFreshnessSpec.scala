package graft.cells

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class PyramidFreshnessSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("pyramid-freshness-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("pyramid invariant: every parent tile's count = sum of its children") {
    val s = spark
    import s.implicits._
    val pts = (0L until 500L).map(i => ((i * 48271) % 8192, (i * 16807) % 8192))
      .toDF("xi", "yi")
    val pyr = TilePyramid.pyramidCounts(pts, "xi", "yi", bits = 13, maxRes = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // zoom 0 holds everything
    assert(pyr((0, 0L, 0L)) == 500L)
    for (((res, ix, iy), n) <- pyr if res < 5) {
      val kids = (for (dx <- 0 to 1; dy <- 0 to 1)
        yield pyr.getOrElse((res + 1, ix * 2 + dx, iy * 2 + dy), 0L)).sum
      assert(kids == n, s"tile ($res, $ix, $iy)")
    }
  }

  test("half-life weight halves per period, clamps, and sums exactly") {
    val s = spark
    import s.implicits._
    val ages = Seq(-5L, 0L, 15L, 16L, 33L, 16L * 70).toDF("age")
      .withColumn("w", Freshness.halfLifeWeightMicro("age", 16))
    val w = ages.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(-5L) == 1000000L) // clock skew: full weight
    assert(w(0L) == 1000000L)
    assert(w(15L) == 1000000L)
    assert(w(16L) == 500000L)
    assert(w(33L) == 250000L)
    assert(w(16L * 70) == 0L) // beyond the clamp: exactly zero
  }
}
