package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) apportionment of an integer sampling
  * budget across domains proportionally to an integer score — the "crawl
  * quota by authority" step that turns PageRank/HITS scores into per-site
  * document budgets. Exact integer arithmetic end to end: base quota
  * `B·s div S`, then the leftover seats go to the largest remainders
  * `B·s mod S` (ties to the smaller domain name) — so the quotas sum to
  * EXACTLY `B` and are bit-identical on any engine, which is what lets a
  * SQL oracle gate the whole chain including the iterative rank that
  * feeds it.
  *
  * Scale: two scalar aggregates (ΣS, Σbase — artifact-sized driver
  * actions, same contract as the rank's own scalars) and one global
  * remainder rank. The global window is a sort of one row per DOMAIN
  * (~10⁸ at web scale — a single executor's worth); for larger universes
  * the standard trick is per-shard apportionment of per-shard budgets. */
object Apportion {

  /** `scores(key, s)` → `(key, s, base, extra, quota)` with Σquota = B. */
  def largestRemainder(scores: DataFrame, keyCol: String, sCol: String,
                       budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val sTot = scores.agg(sum(col(sCol).cast("long"))).head().getLong(0)
    require(sTot > 0, "total score must be positive")
    require(budget <= Long.MaxValue / sTot,
      s"budget=$budget x total score $sTot would overflow Long")
    val based = scores.select(col(keyCol).as("key"),
        col(sCol).cast("long").as("s"))
      .withColumn("base", expr(s"($budget * s) div ${sTot}L"))
      .withColumn("rem", expr(s"($budget * s) % ${sTot}L"))
    val leftover = budget -
      based.agg(sum(col("base"))).head().getLong(0)
    based
      .withColumn("__rr", row_number().over(
        Window.orderBy(col("rem").desc, col("key"))))
      .select(col("key"), col("s"), col("base"),
        when(col("__rr") <= leftover, 1L).otherwise(0L).as("extra"))
      .withColumn("quota", col("base") + col("extra"))
  }
}
