package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source single-pass shortest paths over a weighted directed graph
  * — Bellman-Ford relaxation as iterated keyed joins (the weighted
  * generalization of [[Bfs]]): each round joins the tentative-distance
  * table to the edge list on `src` and takes the per-node minimum of
  * (old dist, dist + w).
  *
  * `maxRounds` bounds results to paths of <= maxRounds edges; once a
  * round improves nothing the loop exits early, and a converged result
  * equals the true shortest distances (extra relaxation rounds are
  * no-ops). Rows are (long id, long dist) only — weights and ids, never
  * payloads — with a per-round localCheckpoint to cut the iterative
  * lineage, exactly the CC/PageRank discipline. The one driver `count`
  * per round (improvement probe) is the documented guarded action that
  * drives termination. */
object Sssp {

  /** `edges(src, dst, w)` (non-negative long weights) + `seeds(id)` →
    * `(id, dist)` for every node reachable within `maxRounds` edges. */
  def distances(edges: DataFrame, seeds: DataFrame, maxRounds: Int): DataFrame = {
    require(maxRounds >= 0, s"maxRounds must be >= 0: $maxRounds")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(true)
    var dist = seeds.select(col("id")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    var r = 0
    var improved = 1L
    while (r < maxRounds && improved > 0) {
      val cand = e.join(dist.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      val next = dist.unionByName(cand)
        .groupBy("id").agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
      improved = next.as("n")
        .join(dist.select(col("id"), col("dist").as("old")), Seq("id"), "left_outer")
        .where(col("old").isNull || col("dist") < col("old"))
        .count()
      dist = next
      r += 1
    }
    dist
  }
}
