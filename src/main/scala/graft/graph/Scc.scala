package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of the DIRECTED link graph — the audit
  * undirected CC cannot answer: "which domain clusters actually link each
  * other both ways" (link rings, mutual-citation farms) vs one-way fans.
  *
  * Orzan's coloring scheme, the standard distributed SCC recipe (used by
  * the FW-BW-Trim family): each outer round
  *   1. forward-floods every node's id as a color, keeping the MAX —
  *      at fixpoint color(v) = max id that can reach v;
  *   2. nodes with color(v) = v are roots; a backward flood from each
  *      root, restricted to its own color class, marks exactly the nodes
  *      that also REACH the root → mutual reachability → the root's SCC
  *      (all roots flood simultaneously — one job, many components);
  *   3. removes finished SCCs and repeats on the remainder.
  *
  * Every exchange is (long, long); floods are keyed max/any aggregates
  * with per-round `localCheckpoint` and one guarded driver count — the
  * Bfs/CC/KCore discipline. Inner rounds ≤ graph diameter (small for web
  * graphs); outer rounds = SCC "peel depth". Worst case (a directed path)
  * degenerates to O(n) inner rounds — the documented trade for keeping
  * every round a pure equi-join, which is what survives 10^9 edges.
  */
object Scc {

  /** `edges(src, dst)` directed (self-loops ignored, duplicates collapsed)
    * → `(id, scc)`: every node of the graph with its component id,
    * normalized to the MIN member id. Singleton nodes (no cycle through
    * them) form singleton SCCs. */
  def components(edges: DataFrame): DataFrame = {
    var e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    var nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    var result: DataFrame = null

    var remaining = nodes.count()
    while (remaining > 0) {
      // 1. forward max-flood: color(v) = max id reaching v (incl. itself)
      var color = nodes.withColumn("color", col("id"))
        .localCheckpoint(true)
      var changed = 1L
      while (changed > 0) {
        val pushed = color.join(e, col("id") === col("src"))
          .groupBy(col("dst").as("id"))
          .agg(max("color").as("pc"))
        // old color carried through the checkpoint: the convergence test
        // is a narrow filter, not a second join per pass
        val next = color.join(pushed, Seq("id"), "left")
          .select(col("id"),
            greatest(col("color"), coalesce(col("pc"), col("color")))
              .as("color"),
            col("color").as("__old"))
          .localCheckpoint(true)
        changed = next.where(col("color") =!= col("__old")).count()
        color = next.select("id", "color")
      }
      // 2. backward flood from roots within each color class
      var in = color.where(col("color") === col("id"))
        .select(col("id"), col("color")).localCheckpoint(true)
      var grew = 1L
      var inCount = in.count()
      while (grew > 0) {
        val pulled = in.join(e, col("id") === col("dst"))
          .select(col("src").as("id"), col("color"))
        val cand = pulled.join(color.withColumnsRenamed(
            Map("id" -> "id2", "color" -> "c2")),
            col("id") === col("id2") && col("color") === col("c2"))
          .select(col("id"), col("color"))
        in = in.unionAll(cand).distinct().localCheckpoint(true)
        // one count per pass (the previous size is remembered, not
        // re-counted over the same checkpointed frame)
        val c = in.count()
        grew = c - inCount
        inCount = c
      }
      val found = in // (id, color): finished SCC membership this round
      result = if (result == null) found else result.unionAll(found)
      // 3. peel finished nodes and their edges
      val done = found.select("id").localCheckpoint(true)
      nodes = nodes.join(done, Seq("id"), "left_anti").localCheckpoint(true)
      e = e.join(done.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .join(done.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
        .localCheckpoint(true)
      remaining = nodes.count()
    }
    // normalize component ids to the min member id
    val norm = result.groupBy("color").agg(min("id").as("scc"))
    result.join(norm, "color").select(col("id"), col("scc"))
  }
}
