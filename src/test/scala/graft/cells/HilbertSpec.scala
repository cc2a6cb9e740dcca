package graft.cells

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class HilbertSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("hilbert-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Plain-Scala xy2d reference (quadrant digit + rotate/flip). */
  private def refXy2d(order: Int, x0: Long, y0: Long): Long = {
    val n = 1L << order
    var (x, y, d) = (x0, y0, 0L)
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("exhaustive for orders 2..5: reference parity, permutation, " +
      "and unit-step neighbors") {
    val s = spark
    import s.implicits._
    for (order <- 2 to 5) {
      val n = 1 << order
      val pts = for (x <- 0L until n; y <- 0L until n) yield (x, y)
      val got = pts.toDF("ix", "iy")
        .withColumn("h", Hilbert.hvalue(col("ix"), col("iy"), order))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      for ((x, y) <- pts)
        assert(got((x, y)) == refXy2d(order, x, y), s"order=$order ($x,$y)")
      val byD = pts.sortBy(p => got(p))
      assert(byD.map(got).toSeq == (0L until n.toLong * n).toSeq,
        s"order=$order: h must be a permutation of 0..n²-1")
      for (i <- 0 until byD.length - 1) {
        val (ax, ay) = byD(i); val (bx, by) = byD(i + 1)
        assert(math.abs(ax - bx) + math.abs(ay - by) == 1,
          s"order=$order: curve positions $i and ${i + 1} are not lattice neighbors")
      }
    }
  }

  test("contiguous hilbert blocks have tight square-ish envelopes at order 8") {
    val s = spark
    import s.implicits._
    val n = 256
    // full lattice is 64k points — sample a deterministic stripe instead
    val pts = (0 until 4096).map(i => ((i * 73L) % n, (i * 149L + 7) % n))
    val base = pts.toDF("ix", "iy")
    // attach (the linear-plan data form) must agree with the reference
    val sample = Hilbert.attach(base.limit(200), "ix", "iy", 8, "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((x, y, h) <- sample) assert(h == refXy2d(8, x, y), s"attach($x,$y)")
    val rows = Hilbert.attach(base, "ix", "iy", 8, "h")
      .withColumn("block", expr("h div 4096"))
      .groupBy("block")
      .agg(max("ix") - min("ix"), max("iy") - min("iy"))
      .collect()
    // a 4096-position hilbert range lives inside a 64×64 tile up to one
    // boundary crossing — envelopes must stay far below the 255 span a
    // row-major or random order would produce
    for (r <- rows) {
      assert(r.getLong(1) <= 127 && r.getLong(2) <= 127,
        s"block ${r.getLong(0)}: envelope ${r.getLong(1)}×${r.getLong(2)}")
    }
  }
}
