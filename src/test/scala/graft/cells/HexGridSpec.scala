package graft.cells

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Geometry and parity checks for the hexagonal cell vocabulary. */
class HexGridSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("hexgrid-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Center of axial hex (q, r) on a pointy-top grid of size s. */
  private def center(q: Long, r: Long, s: Double): (Double, Double) =
    (s * HexGrid.Sqrt3 * (q + r / 2.0), s * 1.5 * r)

  test("attach: every point's assigned hex center is the NEAREST hex " +
       "center (nearest-center is exactly hexagon containment)") {
    val s = spark
    import s.implicits._
    val size = 10.0
    val rnd = new scala.util.Random(5)
    val pts = (1 to 400).map(_ =>
      (rnd.nextDouble() * 200 - 100, rnd.nextDouble() * 200 - 100))
    val got = HexGrid.attach(pts.toDF("x", "y"), "x", "y", size)
      .collect().map(r => (r.getDouble(0), r.getDouble(1),
        r.getLong(2), r.getLong(3)))
    got.foreach { case (x, y, hq, hr) =>
      val (cx, cy) = center(hq, hr, size)
      val dSelf = (x - cx) * (x - cx) + (y - cy) * (y - cy)
      // no other center within a 2-ring may be closer (ties allowed —
      // boundary points may legitimately round either way)
      for (dq <- -2 to 2; dr <- -2 to 2 if dq != 0 || dr != 0) {
        val (nx, ny) = center(hq + dq, hr + dr, size)
        val dN = (x - nx) * (x - nx) + (y - ny) * (y - ny)
        assert(dSelf <= dN + 1e-9,
          s"($x,$y) assigned ($hq,$hr) but center ($dq,$dr) away is closer")
      }
    }
  }

  test("attach: the origin maps to hex (0,0); a center maps to its own " +
       "hex") {
    val s = spark
    import s.implicits._
    val size = 10.0
    val centers = Seq((0L, 0L), (3L, -2L), (-1L, 4L), (2L, 2L))
    val pts = centers.map { case (q, r) => center(q, r, size) }
    val got = HexGrid.attach(pts.toDF("x", "y"), "x", "y", size)
      .select("hq", "hr").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === centers)
  }

  test("hexDist: neighbors are 1 away, matches cube distance on a " +
       "random sample") {
    val s = spark
    import s.implicits._
    val rows = (for ((dq, dr) <- HexGrid.neighbors)
      yield (0L, 0L, dq.toLong, dr.toLong)) ++
      Seq((0L, 0L, 3L, -1L), (2L, -1L, -2L, 3L), (5L, 5L, 5L, 5L))
    val got = rows.toDF("q1", "r1", "q2", "r2")
      .select(HexGrid.hexDist(col("q1"), col("r1"), col("q2"), col("r2"))
        .as("d")).collect().map(_.getLong(0))
    val want = rows.map { case (q1, r1, q2, r2) =>
      (math.abs(q1 - q2) + math.abs(r1 - r2) +
        math.abs(q1 + r1 - q2 - r2)) / 2
    }
    assert(got.toSeq === want)
    assert(got.take(6).forall(_ === 1L))
  }

  test("focalSum: matches brute-force 7-tap neighborhood sum") {
    val s = spark
    import s.implicits._
    val counts = Seq((0L, 0L, 5L), (1L, 0L, 3L), (0L, 1L, 2L),
      (1L, -1L, 7L), (3L, 3L, 11L))
    val got = HexGrid.focalSum(counts.toDF("hq", "hr", "c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val m = counts.map { case (q, r, c) => (q, r) -> c }.toMap
    counts.foreach { case (q, r, c) =>
      val focal = c + HexGrid.neighbors.map { case (dq, dr) =>
        m.getOrElse((q + dq, r + dr), 0L) }.sum
      assert(got((q, r)) === ((c, focal)))
    }
  }
}
