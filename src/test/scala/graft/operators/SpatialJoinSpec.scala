package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.fixtures.TpchGeo
import graft.operators.Surrogate

/** Join-strategy invariants: salting and broadcast-vs-shuffle must never
  * change results — only the physical plan. */
class SpatialJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false").appName("sjoin-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def srg(salt: Int) =
    Surrogate.pointSurrogate(TpchGeo.points(spark, sfDir),
        TpchGeo.counties(spark), TpchGeo.grid, TpchGeo.domain, TpchGeo.zres,
        srgCode = 100, saltFactor = salt)
      .collect().map(_.toString).toSeq

  test("hot-cell salting (saltFactor 4) is result-identical to unsalted") {
    assert(srg(1) == srg(4))
  }

  test("shuffle-hash path (broadcastPolys=false) matches broadcast path") {
    val pts = TpchGeo.points(spark, sfDir)
    val polys = TpchGeo.counties(spark)
    val a = SpatialJoin.pointInPoly(pts, polys, TpchGeo.domain, TpchGeo.zres,
        broadcastPolys = true)
      .select("o_orderkey", "fips").collect().map(_.toString).sorted.toSeq
    val b = SpatialJoin.pointInPoly(pts, polys, TpchGeo.domain, TpchGeo.zres,
        broadcastPolys = false)
      .select("o_orderkey", "fips").collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("adaptive multi-resolution join matches fixed-res and bounds explode") {
    import spark.implicits._
    val pts = TpchGeo.points(spark, sfDir)
    // mixed-size layer: one huge polygon + the 16 counties
    val mixed = TpchGeo.counties(spark).unionByName(
      Seq(("BIG", Seq(Seq(0.0, 0, 8000, 0, 8000, 8000, 0, 8000))))
        .toDF("fips", "geom"))
    val fixed = SpatialJoin.pointInPoly(pts, mixed, TpchGeo.domain, TpchGeo.zres)
      .select("o_orderkey", "fips").collect().map(_.toString).sorted.toSeq
    val adaptive = SpatialJoin.pointInPolyAdaptive(pts, mixed,
        TpchGeo.domain, TpchGeo.zres)
      .select("o_orderkey", "fips").collect().map(_.toString).sorted.toSeq
    assert(adaptive == fixed && adaptive.nonEmpty)

    // the huge polygon's adaptive cover is tiny; its fixed cover is 256 cells
    import graft.spark.GeoFunctions._
    val big = mixed.where($"fips" === "BIG")
    val nFixed = big.select(explode(polyCoverCells($"geom", TpchGeo.domain,
      TpchGeo.zres))).count()
    val nAdaptive = big.select(explode(polyAdaptiveCoverCells($"geom",
      TpchGeo.domain, TpchGeo.zres))).count()
    assert(nFixed >= 256 && nAdaptive <= 4,
      s"fixed=$nFixed adaptive=$nAdaptive")
  }

  test("adaptive poly×poly fragments match fixed-res on a mixed-size layer") {
    import spark.implicits._
    val tracts = TpchGeo.tracts(spark, sfDir)
    // mixed B side: 16 counties + one huge polygon + one tiny one
    val mixed = TpchGeo.counties(spark).unionByName(Seq(
        ("BIG",  Seq(Seq(0.0, 0, 8000, 0, 8000, 8000, 0, 8000))),
        ("TINY", Seq(Seq(700.0, 700, 790, 700, 790, 790, 700, 790))))
      .toDF("fips", "geom"))
      .withColumnRenamed("geom", "bgeom")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("p_partkey"), col("fips"), col("frag_area"))
      .collect().map(_.toString).sorted.toSeq
    val fixed = key(SpatialJoin.polyPolyFragments(
      tracts, mixed, TpchGeo.domain, TpchGeo.zres, keepFragGeom = false))
    val adaptive = key(SpatialJoin.polyPolyFragmentsAdaptive(
      tracts, mixed, TpchGeo.domain, TpchGeo.zres, keepFragGeom = false))
    assert(adaptive == fixed && adaptive.nonEmpty)
  }

  test("overlayPolys / overlayLines semi-join semantics") {
    import spark.implicits._
    val mask = Seq(Tuple1(Seq(Seq(500.0, 500, 2500, 500, 2500, 2500, 500, 2500))))
      .toDF("geom")
    // polygons: one inside, one overlapping, one disjoint
    val polys = Seq(
      ("in",      Seq(Seq(1000.0, 1000, 1200, 1000, 1200, 1200, 1000, 1200))),
      ("overlap", Seq(Seq(2400.0, 2400, 2600, 2400, 2600, 2600, 2400, 2600))),
      ("out",     Seq(Seq(4000.0, 4000, 4200, 4000, 4200, 4200, 4000, 4200)))
    ).toDF("pid", "geom")
    val hits = SpatialJoin.overlayPolys(polys, mask, TpchGeo.domain, TpchGeo.zres)
      .select("pid").collect().map(_.getString(0)).sorted.toSeq
    assert(hits == Seq("in", "overlap"))

    val lines = Seq(
      ("cross", Seq(0.0, 1000, 3000, 1000)),
      ("miss",  Seq(0.0, 4000, 3000, 4000))
    ).toDF("lid", "line")
    val lhits = SpatialJoin.overlayLines(lines, mask, TpchGeo.domain, TpchGeo.zres)
      .select("lid").collect().map(_.getString(0)).toSeq
    assert(lhits == Seq("cross"))
  }

  test("overlay mask guard rejects fact-table-sized masks") {
    import spark.implicits._
    // 100001 tiny rects exceed the dimension contract; the limit bounds the
    // collect itself, so this fails fast rather than OOMing the driver
    val huge = spark.range(100001)
      .select(org.apache.spark.sql.functions.expr(
        "array(array(CAST(id AS DOUBLE), 0.0D, CAST(id+1 AS DOUBLE), 0.0D," +
        " CAST(id+1 AS DOUBLE), 1.0D, CAST(id AS DOUBLE), 1.0D))").as("geom"))
    val polys = Seq(Seq(Seq(0.0, 0, 4, 0, 4, 4, 0, 4))).toDF("geom")
    val ex = intercept[IllegalArgumentException] {
      SpatialJoin.overlayPolys(polys, huge, graft.fixtures.TpchGeo.domain, 4)
    }
    assert(ex.getMessage.contains("cell-join"))
  }

  test("adaptive line-poly fragments match the fixed-resolution join exactly") {
    import graft.fixtures.TpchGeo
    val roads = TpchGeo.roads(spark, sfDir)
    val counties = TpchGeo.counties(spark)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("s_suppkey", "fips", "frag_len").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val fixed = keys(SpatialJoin.linePolyFragments(
      roads, counties, TpchGeo.domain, TpchGeo.zres))
    val adaptive = keys(SpatialJoin.linePolyFragmentsAdaptive(
      roads, counties, TpchGeo.domain, TpchGeo.zres))
    assert(fixed.nonEmpty && adaptive == fixed,
      s"missing=${(fixed -- adaptive).take(3)} extra=${(adaptive -- fixed).take(3)}")
  }
}
