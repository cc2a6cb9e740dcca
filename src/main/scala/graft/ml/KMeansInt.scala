package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One Lloyd iteration of k-means over int8-quantized embeddings — the
  * SemDeDup-style semantic-clustering step a curation pipeline runs to
  * group near-duplicate meaning before per-cluster dedup/sampling, and the
  * centroid-refinement step of an IVF index build. Working on the
  * quantized vectors (Quantize.int8) keeps EVERY operation exact integer
  * arithmetic: distances are Σ(x−c)² over int8 components (≤ 64·254² ≈
  * 2^22 per 64-dim vector), assignment ties break to the smallest
  * centroid id, and the updated centroid is the componentwise integer
  * mean — computed as `(Σ(x+127) div n) − 127` so the division happens in
  * the non-negative domain, where truncating (Spark `div`) and flooring
  * (other engines) integer division agree.
  *
  * Scale: centroids broadcast (k·d ints); assignment is a narrow
  * per-row argmin (codegen'd HOF lambdas); the update is one
  * (cluster, dim) keyed aggregate — k·d result rows. The classic
  * all-reduce k-means shape, one Spark job per iteration. */
object KMeansInt {

  /** `(id, q8 int[])` vectors + `(cid, cq8 int[])` centroids → one Lloyd
    * step, reported per (cid, dim): the updated component `cx`, the
    * member count `n_members`, and the cluster's total within-cluster
    * squared distance `dist_sum` (constant across the cluster's rows —
    * the convergence monitor). Clusters that attract no members keep
    * their previous centroid (n_members = 0, dist_sum = 0). */
  /** Nearest-centroid assignment — the shared step of lloydStep and the
    * SemDeDup cluster partitioner: centroids broadcast, per-row integer-L2
    * argmin with deterministic (dist, cid) tie-break via one struct min (a
    * per-id aggregate, not a window — no single-partition risk). Returns
    * `(id, cid, dist, q8)`. */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centroids))
      .select(col("id"), col("cid"), col("q8"), expr(
        """aggregate(zip_with(q8, cq8, (x, y) -> cast(x - y as bigint) *
          |  cast(x - y as bigint)), 0L, (a, z) -> a + z)""".stripMargin)
        .as("dist"))
      .groupBy("id")
      .agg(min(struct(col("dist"), col("cid"), col("q8"))).as("m"))
      .select(col("id"), col("m.cid").as("cid"), col("m.dist").as("dist"),
        col("m.q8").as("q8"))

  def lloydStep(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val assigned = assign(vectors, centroids)
      .transform(graft.spark.PersistTracker.persist) // update + dist_sum below
    val sums = assigned
      .select(col("cid"), posexplode(col("q8")))
      .groupBy("cid", "pos")
      .agg(count(lit(1)).as("n_members"),
        sum(col("col") + lit(127L)).as("s"))
    // dist_sum counts each member once (per-cluster aggregate, not the
    // dim-replicated explode above)
    val upd = assigned.groupBy("cid")
      .agg(sum("dist").as("dist_sum"))
    sums
      .select(col("cid"), col("pos").cast("int").as("dim"),
        (expr("s div n_members") - lit(127L)).cast("int").as("cx"),
        col("n_members"))
      .join(upd, "cid")
      .unionByName(
        // empty clusters: previous centroid, zero members
        centroids.join(assigned.select("cid").distinct(), Seq("cid"), "left_anti")
          .select(col("cid"), posexplode(col("cq8")))
          .select(col("cid"), col("pos").cast("int").as("dim"),
            col("col").cast("int").as("cx"), lit(0L).as("n_members"),
            lit(0L).as("dist_sum")))
  }
}
