package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition of the (undirected) domain link graph: the
  * maximal subgraph in which every node keeps degree ≥ k. The classic
  * crawl-graph community/spam-farm filter — a domain outside the k-core
  * has too few mutual links to be part of a tight cluster, and the
  * peeling order is the standard coreness preprocessing for the denser
  * graph analytics (triangles, HITS) downstream.
  *
  * Iterative peel: each round computes degrees over the surviving edge
  * set (one keyed aggregate), drops nodes under k, and filters edges to
  * survivors (two semi-joins) — all rows (long, long), payload-free, the
  * Pregel-style shape of Bfs/CC. Rounds = peel depth of the graph (the
  * intrinsic lower bound for degree-driven peeling); per-round
  * `localCheckpoint` cuts lineage and one tiny count drives termination
  * (the guarded-driver-action contract shared by Bfs and CC). */
object KCore {

  /** `edges(src, dst)` (directed/duplicated input ok; self-loops dropped)
    * → `(id, deg)` — every node of the k-core with its in-core degree. */
  def core(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    var e = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var removed = 1L
    var degs: DataFrame = null
    while (removed > 0) {
      degs = e.select(col("a").as("id"))
        .unionAll(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      val keep = degs.where(col("deg") >= k).select("id")
      removed = degs.count() - keep.count()
      if (removed > 0)
        e = e.join(keep.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
          .localCheckpoint(true)
    }
    degs.where(col("deg") >= k)
  }
}
