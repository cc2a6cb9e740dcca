package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication"):
  * partition the embedding space by nearest centroid, then find
  * high-cosine pairs ONLY within each cluster — the all-pairs product is
  * bounded by the largest cluster, never the corpus, which is the whole
  * point of the k-means pre-pass (clusters are capped by construction at
  * training-data scale; a hot cluster is re-split by another k-means
  * round, not joined through).
  *
  * Everything is exact integer arithmetic on int8-quantized vectors
  * (Quantize.int8): the cosine test cos(a,b) ≥ τ is evaluated as
  * `dot ≥ 0 ∧ 10⁶·dot² ≥ τ²milli·|a|²·|b|²` — no square roots, no floats,
  * bit-identical on any engine. With 64-dim int8 vectors every term fits a
  * Long: dot ≤ 127²·64 ≈ 2²⁰, so 10⁶·dot² ≈ 2⁶⁰ and τ²·|a|²·|b|² is of
  * the same magnitude.
  */
object SemDedup {

  /** `(id, q8)` vectors + `(cid, cq8)` centroids → within-cluster pairs
    * `(cid, id_a, id_b, dot)` with id_a < id_b and cosine ≥ tauMilli/1000.
    * The keep/drop policy (keep min id per group) is a trivial downstream
    * aggregate; the pairs are the expensive, certifiable part. */
  def semanticPairs(vectors: DataFrame, centroids: DataFrame,
                    tauMilli: Int): DataFrame = {
    require(tauMilli >= 0 && tauMilli <= 1000, s"tauMilli out of range: $tauMilli")
    val tau2 = tauMilli.toLong * tauMilli
    val assigned = KMeansInt.assign(vectors, centroids)
      .select(col("id"), col("cid"), col("q8"),
        expr("aggregate(zip_with(q8, q8, (x, y) -> cast(x as bigint) * y)," +
          " 0L, (a, z) -> a + z)").as("n2"))
      .transform(graft.spark.PersistTracker.persist) // both sides of the self-join
    assigned.alias("a")
      .join(assigned.alias("b"),
        col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .select(col("a.cid").as("cid"), col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        expr("aggregate(zip_with(a.q8, b.q8, (x, y) -> cast(x as bigint) * y)," +
          " 0L, (a, z) -> a + z)").as("dot"),
        col("a.n2").as("na2"), col("b.n2").as("nb2"))
      .where(col("dot") >= 0 &&
        lit(1000000L) * col("dot") * col("dot") >= lit(tau2) * col("na2") * col("nb2"))
      .select("cid", "id_a", "id_b", "dot")
  }
}
