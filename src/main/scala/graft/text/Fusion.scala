package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al. 2009) of independent retrieval
  * rankings — the standard hybrid-search combiner (lexical BM25 + embedding
  * ANN): each ranker contributes 1/(K + rank) per (query, doc), summed.
  * Computed in exact integer micro-units `1000000 div (K + rank)`, so the
  * fused ordering is bit-identical on any engine — no float accumulation.
  *
  * Scale shape: the inputs are ALREADY top-k lists (each ≤ k rows per
  * query — the upstream rankers did the heavy lifting with their own
  * salted two-phase top-ks), so the union is ≤ Σkᵢ rows per query and the
  * per-query rank window is bounded by construction — partitioned by qid,
  * never global. */
object Fusion {

  /** Fuse rankings, each `(qid, rank, id)` (extra columns ignored), into
    * `(qid, rank, id, rrf_micro, n_lists)` — top `k` per query by fused
    * score, ties broken by id. `n_lists` = how many input rankings
    * returned the doc (the agreement signal a downstream blender uses). */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty && k > 0 && rrfK >= 0,
      s"need rankings, k > 0, rrfK >= 0 (got ${rankings.size}/$k/$rrfK)")
    val contribs = rankings.map(_.select(
      col("qid").cast("int").as("qid"), col("id").cast("long").as("id"),
      expr(s"1000000 div ($rrfK + rank)").cast("long").as("c")))
    contribs.reduce(_ unionByName _)
      .groupBy("qid", "id")
      .agg(sum("c").as("rrf_micro"), count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("rrf_micro").desc, col("id"))))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("int").as("rank"), col("id"),
        col("rrf_micro"), col("n_lists"))
  }
}
