package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weight-aware exact percentiles — robust aggregation where each row
  * speaks with a weight (token count, crawl frequency): the weighted
  * p-th percentile of a group is the smallest value whose CUMULATIVE
  * weight reaches the ceiling rank `(W·p + 99) div 100` of the group's
  * total weight `W` — the same ceiling-rank convention as the unweighted
  * `PipelineOps.exactPercentiles` (to which this degenerates at w ≡ 1).
  *
  * Exactness costs a per-group ordered window over the DATA (fine for
  * bounded groups like languages/domains); the mergeable
  * [[HistQuantile]] sketch is the unbounded-cardinality path — its
  * counters just sum `w` instead of 1. All arithmetic is integer. */
object WeightedStats {

  /** `(groupCol, valCol, wCol, idCol)` (integer values, positive integer
    * weights; `idCol` breaks value ties deterministically) → one row per
    * group: `(g, total_w, p<P>_w…)`. */
  def weightedPercentiles(df: DataFrame, groupCol: String, valCol: String,
                          wCol: String, idCol: String,
                          ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in 1..100, got $ps")
    val ordered = Window.partitionBy("g")
      .orderBy(col("v"), col("i"))
    val whole = Window.partitionBy("g")
    val cum = df
      .select(col(groupCol).as("g"), col(valCol).cast("long").as("v"),
        col(wCol).cast("long").as("w"), col(idCol).as("i"))
      .withColumn("cw", sum("w").over(ordered))
      .withColumn("tw", sum("w").over(whole))
    cum.groupBy("g")
      .agg(max(col("tw")).as("total_w"),
        ps.map(p => min(when(
          col("cw") >= expr(s"(tw * $p + 99) div 100"), col("v")))
          .as(s"p${p}_w")): _*)
  }
}
