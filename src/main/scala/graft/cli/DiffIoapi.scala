package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Ioapi

/** diffioapi.exe (diffioapi.c:9-298; SA_ch03_vector.md:716-721) as a
  * standalone driver: compare two I/O API files under the reference's env
  * contract —
  *
  *   ORIG_FILE   original I/O API file
  *   NEW_FILE    new I/O API file
  *   TOLERANCE   percent-difference tolerance
  *
  * Header groups are checked first (projection, grid, layers, time
  * structure, variables — `Ioapi.headerDiff`); only when they match do the
  * per-cell values compare (`Ioapi.diffCells`: |100·(new−orig)/orig| >
  * tolerance, orig = 0 never flagged, exactly like the C). */
object DiffIoapi {

  final case class Result(headerIssues: Seq[String], cellDiffs: DataFrame)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .appName("diffioapi").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val r = run(spark, sys.env)
      r.headerIssues.foreach(m => println(s"ERROR: $m"))
      var anyDiff = false
      if (r.headerIssues.isEmpty) {
        val diffs = r.cellDiffs.collect()
        anyDiff = diffs.nonEmpty
        diffs.foreach { d =>
          // the C's per-cell message shape (diffioapi.c:266-273)
          println("Values are different for variable %s at time step %d, layer %d, row %d, column %d: original = %f, new = %f (%.4f%%)"
            .formatLocal(java.util.Locale.US,
              d.getAs[String]("var"), d.getAs[Int]("tstep"),
              d.getAs[Int]("layer"), d.getAs[Int]("row"), d.getAs[Int]("col"),
              d.getAs[Double]("orig_val"), d.getAs[Double]("new_val"),
              d.getAs[Double]("pctdiff")))
        }
        if (!anyDiff) println("Files match within tolerance")
      }
      if (r.headerIssues.nonEmpty || anyDiff) sys.exit(1)
    } finally spark.stop()
  }

  def run(spark: SparkSession, cfg: Map[String, String]): Result = {
    def req(k: String): String = cfg.getOrElse(k,
      throw new IllegalArgumentException(s"$k environment variable is not set"))
    val tol = req("TOLERANCE").toDouble
    val (hA, recA, dfA) = Ioapi.readWithRecs(spark, req("ORIG_FILE"))
    val (hB, recB, dfB) = Ioapi.readWithRecs(spark, req("NEW_FILE"))
    val issues = Ioapi.headerDiff(hA, hB, recA, recB)
    val diffs =
      if (issues.isEmpty) Ioapi.diffCells(dfA, dfB, tol)
      else dfA.limit(0).sparkSession.emptyDataFrame
    Result(issues, diffs)
  }
}
