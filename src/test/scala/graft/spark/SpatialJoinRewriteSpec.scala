package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.fixtures.TpchGeo
import graft.spark.GeoFunctions._

/** The SparkSessionExtensions optimizer rule must turn a naive pip join
  * (cartesian shape) into a hash join on the injected cell key, without
  * changing results. */
class SpatialJoinRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.spark.rules.GraftExtensions")
    .config("spark.graft.cell.domain", "0,0,8192,8192")
    .config("spark.graft.cell.res", "4")
    .appName("rewrite-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("naive pip join is rewritten to a cell-keyed join with identical results") {
    val pts = TpchGeo.points(spark, sfDir)
    val polys = TpchGeo.counties(spark)

    // the NAIVE formulation a user would write — no prefilter
    val naive = pts.join(polys, containsPoint(col("x"), col("y"), col("geom")))
    val plan = naive.queryExecution.optimizedPlan.toString

    assert(plan.contains("cell_encode") && plan.contains("cover_cells"),
      s"rule did not fire:\n$plan")
    val physical = naive.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      s"still cartesian:\n$physical")
    assert(physical.contains("HashJoin"), s"no hash join:\n$physical")

    // results identical to the hand-built prefilter join
    val expected = graft.operators.SpatialJoin.pointInPoly(
        pts, polys, TpchGeo.domain, TpchGeo.zres, keepGeom = true)
      .select("o_orderkey", "fips")
      .collect().map(_.toString).sorted.toSeq
    val got = naive.select("o_orderkey", "fips")
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("joins already carrying a cell key are left alone (idempotent)") {
    val pts = TpchGeo.points(spark, sfDir)
    val polys = TpchGeo.counties(spark)
    val prefiltered = graft.operators.SpatialJoin.pointInPoly(
      pts, polys, TpchGeo.domain, TpchGeo.zres)
    // one cell_encode from the hand-built join; rule must not add another
    val plan = prefiltered.queryExecution.optimizedPlan.toString
    assert("cell_encode".r.findAllIn(plan).size <= 2) // encode + possible alias ref
    assert(prefiltered.count() > 0)
  }
}
