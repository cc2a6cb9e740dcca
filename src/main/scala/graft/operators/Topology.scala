package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Polygon adjacency from shared edges — topology construction (the
  * TopoJSON/coverage-building step): two polygons are neighbors iff they
  * share a FULL edge (rook adjacency); touching at a corner does not
  * count. The reference's county coverages carry this implicitly
  * (sumpoly's county QA sums assume a partition); building the adjacency
  * explicitly is what gapfill-style "borrow from the neighbor" post-ops
  * key on.
  *
  * Plan: explode each ring into direction-normalized edge keys (a pure
  * per-row transform), then one keyed aggregation groups the at-most-two
  * polygons per edge — never a polygon × polygon join. Coordinates are
  * compared exactly (the integer-lattice fixture discipline); real-world
  * coverages would snap to a lattice first. */
object Topology {

  /** `(idCol, geomCol: array<array<double>>)` (flat x,y rings) →
    * `(id_a, id_b, n_edges)` with `id_a < id_b`, one row per neighbor
    * pair, `n_edges` = shared edge count. */
  def edgeAdjacency(polys: DataFrame, idCol: String,
                    geomCol: String): DataFrame = {
    // vertex i of a ring (flat [x0,y0,x1,y1,…]) is (ring[2i], ring[2i+1]);
    // edge i joins vertex i and vertex (i+1) mod nv. The key orders the
    // two endpoint strings so both incident polygons collide.
    val edgeExpr =
      """transform(sequence(0, CAST(size(ring) / 2 AS INT) - 1), i ->
        |  concat_ws(':',
        |    least(concat_ws(',', ring[CAST(2*i AS INT)],
        |                         ring[CAST(2*i+1 AS INT)]),
        |          concat_ws(',', ring[CAST(2*((i+1) % (size(ring) div 2)) AS INT)],
        |                         ring[CAST(2*((i+1) % (size(ring) div 2))+1 AS INT)])),
        |    greatest(concat_ws(',', ring[CAST(2*i AS INT)],
        |                         ring[CAST(2*i+1 AS INT)]),
        |          concat_ws(',', ring[CAST(2*((i+1) % (size(ring) div 2)) AS INT)],
        |                         ring[CAST(2*((i+1) % (size(ring) div 2))+1 AS INT)]))))"""
        .stripMargin
    val edges = polys
      .select(col(idCol).as("pid"), explode(col(geomCol)).as("ring"))
      .select(col("pid"), explode(expr(edgeExpr)).as("edge"))
    edges.as("a").join(edges.as("b"), Seq("edge"))
      .where(col("a.pid") < col("b.pid"))
      .groupBy(col("a.pid").as("id_a"), col("b.pid").as("id_b"))
      .agg(count(lit(1)).as("n_edges"))
  }
}
