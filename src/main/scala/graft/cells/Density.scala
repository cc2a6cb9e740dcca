package graft.cells

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-density clustering — DBSCAN's grid-cell form: a cell is DENSE when
  * it holds ≥ `minPts` points; clusters are the connected components of
  * the dense cells under queen (8-neighbor) adjacency. The classic
  * "where are the population centres" QA over the allocation grid (the
  * reference reports per-county sums; this groups the grid itself).
  *
  * Scale shape: the point stream collapses to per-cell counts in ONE keyed
  * groupBy with map-side partials; everything after is grid-sized — dense
  * cells, an 8-offset explode + self EQUI-join for adjacency (never
  * cell × cell), and the star-contraction connected components from the
  * dedup layer ((long,long) rows, logarithmic rounds, per-round
  * localCheckpoint). No window, no global sort.
  */
object Density {

  /** Cluster the dense cells of `pts` (cell ids in `cxCol`/`cyCol`,
    * 0-based on an `ncols`-wide lattice). Returns one row per cluster:
    * (cluster, n_cells, n_points) where `cluster` is the smallest member
    * cell id (cy·ncols+cx) — deterministic, engine-independent. */
  def clusters(pts: DataFrame, cxCol: String, cyCol: String,
               ncols: Int, minPts: Long): DataFrame = {
    val counts = pts.groupBy(col(cxCol).as("cx"), col(cyCol).as("cy"))
      .agg(count(lit(1)).as("n"))
    val dense = counts.where(col("n") >= minPts)
      .select((col("cy") * ncols + col("cx")).as("id"),
        col("cx"), col("cy"), col("n"))
      .transform(graft.spark.PersistTracker.persist) // nodes + both join sides
    val offsets = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1),
      (0, 1), (1, -1), (1, 0), (1, 1))
    // directed probe rows from each dense cell to its 8 neighbors; the
    // inner equi-join keeps only neighbors that are themselves dense
    val pairs = dense.select(col("id").as("id_a"), col("cx"), col("cy"),
        explode(typedLit(offsets)).as("o"))
      .select(col("id_a"), (col("cx") + col("o._1")).as("nx"),
        (col("cy") + col("o._2")).as("ny"))
      .join(dense.select(col("cx").as("nx"), col("cy").as("ny"),
        col("id").as("id_b")), Seq("nx", "ny"))
      .select(col("id_a"), col("id_b"))
    // (doc_id, rep_id) with rep_id = smallest member id of the component
    val labels = graft.text.TextOps.connectedComponentsStar(
      dense.select("id"), pairs)
    labels.join(dense.select(col("id").as("doc_id"), col("n")), "doc_id")
      .groupBy(col("rep_id").as("cluster"))
      .agg(count(lit(1)).as("n_cells"), sum("n").as("n_points"))
  }
}
