package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM change-point detection over keyed count series — the drift
  * monitor a crawl-ops dashboard runs per domain / event type: "did this
  * series shift from its own mean, and when". Page's cumulative-sum
  * statistic S_t = max(0, S_{t-1} + (x_t − μ)) is recursive, which naively
  * forces a sequential scan; we use the exact prefix identity
  *
  *   S_t = P_t − min(0, min_{j≤t} P_j),   P_t = Σ_{i≤t} (x_i − μ)
  *
  * so the whole detector is three window functions over the SAME
  * (key ORDER BY t) frame — one shuffle by key, linear per-partition work,
  * and every series stays independent (a 10^8-key corpus parallelizes
  * perfectly; no global state, no recursion, no UDAF).
  *
  * Exact integer arithmetic: deviations are scaled by the per-key series
  * length D (dev = x·D − Σx, so Σdev = 0 exactly) — both engines compute
  * bit-identical longs, no float mean.
  */
object Changepoint {

  /** df(key, t, x) → (key, t, x, cusum, alarm): cusum in x·D units;
    * alarm when cusum · denom > Σx · num (i.e. cusum > (num/denom)·total,
    * kept in integers). Requires x non-negative longs; one row per (key,t). */
  def cusum(df: DataFrame, key: String, t: String, x: String,
            num: Int = 1, denom: Int = 4): DataFrame = {
    val byKey = Window.partitionBy(key)
    val ordered = byKey.orderBy(t)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__d", count(lit(1)).over(byKey))
      .withColumn("__tot", sum(col(x)).over(byKey))
      .withColumn("__p",
        sum(col(x) * col("__d") - col("__tot")).over(ordered))
      .withColumn("__m", min(col("__p")).over(ordered))
      .withColumn("cusum", col("__p") - least(lit(0L), col("__m")))
      .withColumn("alarm",
        (col("cusum") * denom > col("__tot") * num).cast("int"))
      .drop("__d", "__tot", "__p", "__m")
  }
}
