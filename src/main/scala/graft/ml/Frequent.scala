package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spark.expressions.MisraGriesAgg

/** Deterministic heavy-hitter extraction: the Misra–Gries
  * `TypedImperativeAggregate` (one pass, k-bounded mergeable state) finds
  * a ≤ k candidate set that PROVABLY contains every item with frequency
  * > N/(k+1); a second pass re-counts only that bounded sliver exactly
  * and keeps items with `cnt·(k+1) > N` — the output is the exact
  * true-heavy-hitter set, independent of partitioning/merge order (the
  * sketch-then-certify discipline of the ANN recall gates).
  *
  * Scale shape: pass 1 is ONE hash aggregate whose state is ≤ k pairs
  * per partial (map-side combined like any built-in agg); the candidate
  * collect is bounded by k (a guarded probe contract); pass 2 filters
  * the stream by an isin(candidates) literal — codegen, no shuffle of
  * non-candidates — and counts the ≤ k survivors. */
object Frequent {

  /** The sketch as a Column aggregate: `agg(misraGries(col, k))` →
    * array<string> candidates. */
  def misraGries(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.ExprBridge.column(
      MisraGriesAgg(org.apache.spark.sql.graft.ExprBridge.expression(c), k)
        .toAggregateExpression())

  /** Exact items of `col(itemCol)` with frequency > N/(k+1):
    * (item, cnt, n_total). */
  def heavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val items = df.select(col(itemCol).as("w")).where(col("w").isNotNull)
      .transform(graft.spark.PersistTracker.persist) // sketch + recount
    val row = items.agg(misraGries(col("w"), k).as("cand"),
      count(lit(1)).as("n")).head()
    val cand = row.getSeq[String](0)
    val n = row.getLong(1)
    require(cand.size <= k, s"sketch returned ${cand.size} > k=$k items")
    items.where(col("w").isin(cand: _*))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * (k + 1) > n)
      .select(col("w"), col("cnt"), lit(n).as("n_total"))
  }
}
