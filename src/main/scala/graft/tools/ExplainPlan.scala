package graft.tools

import org.apache.spark.sql.SparkSession
import graft.fixtures.{Pages, TpchGeo}
import graft.operators.Surrogate

/** Dev tool: dump the physical plan of the flagship bench job to check
  * pushdown/pruning/codegen (not part of the library surface). */
object ExplainPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_bench_pages_r2000")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = Surrogate.pointSurrogate(
      Pages.geotag(spark.read.parquet(dir)),
      TpchGeo.counties(spark),
      TpchGeo.grid, TpchGeo.domain, TpchGeo.zres, 300, ordered = false)
    plan.explain("formatted")
    spark.stop()
  }
}
