package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.grid.Proj

/** CONVERT_SHAPE layer reprojection: roundtrip exactness and densify
  * semantics at the DataFrame level. */
class ReprojectSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]").config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false").appName("reproj-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val lcc = Proj.Lcc(33, 45, 40, -97)

  test("point layer roundtrips latlon → lcc → latlon within 1e-9 degrees") {
    import spark.implicits._
    val pts = Seq((-95.5, 36.25), (-88.0, 34.5), (-100.25, 41.0))
      .toDF("x", "y")
    val there = Reproject.points(pts, Proj.LatLon, lcc)
    val back = Reproject.points(there, lcc, Proj.LatLon)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    Seq((-95.5, 36.25), (-88.0, 34.5), (-100.25, 41.0)).zip(back).foreach {
      case ((lon, lat), (lon2, lat2)) =>
        assert(math.abs(lon - lon2) < 1e-9 && math.abs(lat - lat2) < 1e-9)
    }
  }

  test("polygon layer reprojects with densification: more vertices, finite area") {
    import spark.implicits._
    val polys = Seq(Tuple1(Seq(Seq(-96.0, 35.0, -94.0, 35.0, -94.0, 37.0, -96.0, 37.0))))
      .toDF("geom")
    val out = Reproject.polygons(polys, Proj.LatLon, lcc, maxSeg = 0.25)
      .collect().head.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("geom")
    assert(out.head.length > 8, "densify should add vertices")
    val area = graft.geom.Geo.polygonArea(out.map(_.toArray).toArray)
    // 2°×2° near 36N ≈ 2e10 m² order of magnitude
    assert(area > 1e10 && area < 1e11)
  }

  test("line densify + reproject preserves endpoints exactly") {
    import spark.implicits._
    val lines = Seq(Tuple1(Seq(-96.0, 35.0, -94.0, 37.0))).toDF("line")
    val out = Reproject.lines(lines, Proj.LatLon, lcc, maxSeg = 0.1)
      .collect().head.getAs[scala.collection.Seq[Double]]("line")
    val (sx, sy) = lcc.forward(-96.0, 35.0)
    val (ex, ey) = lcc.forward(-94.0, 37.0)
    assert(out.head == sx && out(1) == sy)
    assert(out(out.length - 2) == ex && out.last == ey)
    assert(out.length > 4)
  }
}
