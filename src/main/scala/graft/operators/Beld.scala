package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** beld3smk (beld3smk.c:40-629; docs SA_ch03_vector.md:684-710): merge
  * per-tile BELD3 landuse files into domain-wide tables. The reference
  * reads three netCDF files per tile — "_a" carries variables 0-119, "_b"
  * variables 120-229, "_tot" the FOREST total — sums each variable across
  * tiles per cell, warns when a cell's summed landuse differs from 100%
  * by more than 0.01 (beld3smk.c:496-509), and writes merged _a/_b/_tot.
  *
  * Spark-first shape: each input is a TILE-PARTITIONED wide table
  * (tile, col, row, vars…). Every merge is ONE hash aggregation on
  * (col, row) with map-side partial sums — the 230-variable width rides
  * in columns, never in rows, so the shuffle moves each cell once no
  * matter how many variables exist. At 100 TB the tile partitioning
  * prunes to the requested window before any aggregation (plan-asserted
  * in PartitionPruningSpec for the q45 layout).
  */
object Beld {

  final case class Merged(a: DataFrame, b: DataFrame, tot: DataFrame,
                          qa: DataFrame)

  private def sumVars(df: DataFrame, vars: Seq[String]): DataFrame = {
    require(vars.nonEmpty, "beld merge needs at least one variable")
    val aggs = vars.map(v => sum(col(v)).as(v))
    df.groupBy(col("col"), col("row")).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge the three per-tile tables. `qa` holds the cells failing the
    * 100% landuse check: (col, row, total, pctdiff) with
    * pctdiff = total − 100 exactly like the C warning.
    *
    * beld3smk.c:496-509 checks EVERY cell of the domain, so the _a/_b
    * alignment is a full-outer join with a missing side counting as 0 —
    * sparse inputs (Ioapi.read dropZeros) where a cell appears in only
    * one file still reach the check. Pass `domainCells` (a (col, row)
    * frame covering the grid) to also flag cells absent from both files;
    * the gridded domain is the small side, so this join is cheap. */
  def merge3(a: DataFrame, b: DataFrame, tot: DataFrame,
             varsA: Seq[String], varsB: Seq[String], totVar: String = "FOREST",
             qaTol: Double = 0.01,
             domainCells: Option[DataFrame] = None): Merged = {
    val outA = sumVars(a, varsA)
    val outB = sumVars(b, varsB)
    val outTot = sumVars(tot, Seq(totVar))
    val totalExpr = (varsA ++ varsB)
      .map(v => coalesce(col(v), lit(0.0))).reduce(_ + _)
    val totals = outA.join(outB, Seq("col", "row"), "full_outer")
      .select(col("col"), col("row"), totalExpr.as("total"))
    Merged(outA, outB, outTot, qa100(totals, qaTol, domainCells))
  }

  /** The 100%-landuse check itself (beld3smk.c:496-509), shared by merge3
    * and the Beld3Smk driver: totals = (col, row, total); with
    * `domainCells` EVERY domain cell is checked — a cell absent from
    * `totals` (covered by no file/tile) fails at total = 0. */
  def qa100(totals: DataFrame, qaTol: Double = 0.01,
            domainCells: Option[DataFrame] = None): DataFrame = {
    val all = domainCells match {
      case Some(cells) =>
        cells.select("col", "row").join(totals, Seq("col", "row"), "left_outer")
      case None => totals
    }
    all.withColumn("total", coalesce(col("total"), lit(0.0)))
      .withColumn("pctdiff", col("total") - 100.0)
      .where(abs(col("pctdiff")) > qaTol)
      .select("col", "row", "total", "pctdiff")
  }

  /** convert_beld's negative-reset rule (convert_beld.c:140-150): the BELD
    * conversion is "very similar to, but not the same as, the surrogate
    * calculations" — when a numerator or denominator is negative (BELD
    * missing-data sentinels), the row resets to frac = −numer, numer = 0,
    * denom = 0 instead of reporting a bogus ratio. Input: surrogate-shaped
    * rows carrying (frac, numer, denom); narrow projection, no shuffle. */
  def convertResetRule(srg: DataFrame): DataFrame = {
    val bad = col("numer") < 0.0 || col("denom") < 0.0
    srg.withColumn("frac", when(bad, -col("numer")).otherwise(col("frac")))
      .withColumn("__numer2", when(bad, 0.0).otherwise(col("numer")))
      .withColumn("denom", when(bad, 0.0).otherwise(col("denom")))
      .drop("numer").withColumnRenamed("__numer2", "numer")
  }
}
