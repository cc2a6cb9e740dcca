package graft.cells

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Terrain analysis over a lattice value raster — the two classic
  * derivatives of a surface grid (here the page-density surface; the
  * same kernels serve any per-cell statistic):
  *
  *  - Horn's finite-difference gradient (the standard GIS slope/aspect
  *    operator; cf. reference `raster/geo_functions.cpp` neighborhood
  *    processing, declared a non-goal as a TOOL but whose kernel shape
  *    belongs in the engine). Kept in exact integers: dz/dx and dz/dy
  *    are the raw Horn weighted sums (no /8Δ normalization), gradient
  *    magnitude is reported SQUARED, and aspect is classified into 8
  *    integer octants by sign/magnitude comparisons — no float, no
  *    trig, bit-identical on any engine.
  *
  *  - D8 flow routing (O'Callaghan–Mark): each cell points at the
  *    steepest strictly-lower Moore neighbor (tie → smallest fixed
  *    neighbor index); cells with no lower neighbor are sinks. Because
  *    elevation strictly decreases along pointers the flow graph is an
  *    acyclic functional forest, so basins resolve by POINTER DOUBLING
  *    (`graph.PointerDoubling`, ⌈log₂ chain⌉ self-joins) rather than
  *    per-hop iteration.
  *
  * Scale shape (both): one keyed count groupBy of the point stream,
  * then GRID-sized work only — 8/9-offset literal explodes + equi-joins
  * on cell keys, keyed aggregates, no windows, no driver loops. At a
  * 10⁸-cell modeling grid every exchange carries (long, long, long)
  * rows; the D8 resolve adds ⌈log₂ L⌉ grid-sized joins.
  */
object Terrain {

  /** Per-cell counts of `pts` on the `ncols`×`nrows` lattice — empty
    * cells carry 0 (the surface is total on the grid). */
  private[cells] def countSurface(pts: DataFrame, cxCol: String,
      cyCol: String, ncols: Int, nrows: Int): DataFrame = {
    val spark = pts.sparkSession
    val counts = pts.groupBy(col(cxCol).as("cx"), col(cyCol).as("cy"))
      .agg(count(lit(1)).as("c"))
    spark.range(ncols.toLong * nrows)
      .select((col("id") % ncols).as("cx"), expr(s"id div $ncols").as("cy"))
      .join(counts, Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"), coalesce(col("c"), lit(0L)).as("n"))
  }

  /** Horn gradient over the count surface: for each INTERIOR cell
    * (all 8 neighbors on-lattice),
    *   dzdx = (z₊₋+2z₊₀+z₊₊) − (z₋₋+2z₋₀+z₋₊)   (± in x)
    *   dzdy = (z₋₊+2z₀₊+z₊₊) − (z₋₋+2z₀₋+z₊₋)   (± in y)
    * Output: (cx, cy, dzdx, dzdy, grad_sq = dzdx²+dzdy², octant) with
    * octant ∈ 0..7 counter-clockwise from +x by the sign/|·| ladder
    * below, −1 for flat. */
  def hornGradient(pts: DataFrame, cxCol: String, cyCol: String,
                   ncols: Int, nrows: Int): DataFrame = {
    val cells = countSurface(pts, cxCol, cyCol, ncols, nrows)
      .transform(graft.spark.PersistTracker.persist) // centers + gather
    // (dx, dy, wx, wy): Horn weights for the neighbor at (+dx, +dy)
    val w = Seq((-1, -1, -1, -1), (-1, 0, -2, 0), (-1, 1, -1, 1),
      (0, -1, 0, -2), (0, 1, 0, 2),
      (1, -1, 1, -1), (1, 0, 2, 0), (1, 1, 1, 1))
    val gathered = cells.select(col("cx"), col("cy"),
        explode(typedLit(w)).as("o"))
      .select(col("cx"), col("cy"),
        (col("cx") + col("o._1")).as("nx"), (col("cy") + col("o._2")).as("ny"),
        col("o._3").as("wx"), col("o._4").as("wy"))
      .join(cells.select(col("cx").as("nx"), col("cy").as("ny"),
        col("n").as("zn")), Seq("nx", "ny")) // inner: off-lattice drops
      .groupBy("cx", "cy")
      .agg(sum(col("wx") * col("zn")).as("dzdx"),
        sum(col("wy") * col("zn")).as("dzdy"),
        count(lit(1)).as("n_nbrs"))
      .where(col("n_nbrs") === 8) // interior only — Horn needs the full 3×3
    val adx = abs(col("dzdx")); val ady = abs(col("dzdy"))
    gathered.select(col("cx"), col("cy"), col("dzdx"), col("dzdy"),
      (col("dzdx") * col("dzdx") + col("dzdy") * col("dzdy")).as("grad_sq"),
      when(col("dzdx") === 0 && col("dzdy") === 0, lit(-1L))
        .when(adx >= ady && col("dzdx") > 0 && col("dzdy") >= 0, lit(0L))
        .when(adx < ady && col("dzdy") > 0 && col("dzdx") >= 0, lit(1L))
        .when(adx < ady && col("dzdy") > 0, lit(2L))
        .when(adx >= ady && col("dzdx") < 0 && col("dzdy") >= 0, lit(3L))
        .when(adx >= ady && col("dzdx") < 0, lit(4L))
        .when(adx < ady && col("dzdy") < 0 && col("dzdx") <= 0, lit(5L))
        .when(adx < ady && col("dzdy") < 0, lit(6L))
        .otherwise(lit(7L)).as("octant"))
  }

  /** D8 drainage basins over the count surface: steepest-descent
    * pointers (strict drop > 0; tie → smallest neighbor index in the
    * fixed (dx,dy) order below), pointer-doubling resolve to the sink,
    * then basin sizes. Output: one row per sink,
    * (sink_cx, sink_cy, basin_cells) — basin includes the sink. */
  def d8Basins(pts: DataFrame, cxCol: String, cyCol: String,
               ncols: Int, nrows: Int): DataFrame = {
    val cells = countSurface(pts, cxCol, cyCol, ncols, nrows)
      .transform(graft.spark.PersistTracker.persist) // centers + gather
    val offs = Seq((0, -1, -1), (1, -1, 0), (2, -1, 1), (3, 0, -1),
      (4, 0, 1), (5, 1, -1), (6, 1, 0), (7, 1, 1)) // (idx, dx, dy)
    val nbrs = cells.select(col("cx"), col("cy"), col("n"),
        explode(typedLit(offs)).as("o"))
      .select(col("cx"), col("cy"), col("n"), col("o._1").as("idx"),
        (col("cx") + col("o._2")).as("nx"), (col("cy") + col("o._3")).as("ny"))
      .join(cells.select(col("cx").as("nx"), col("cy").as("ny"),
        col("n").as("zn")), Seq("nx", "ny"))
    // argmax(drop) with min-idx tie-break, as ONE keyed struct-max —
    // no window, no sort: max((drop, -idx, dst)) picks the largest drop
    // and among equals the smallest idx
    val best = nbrs.select(col("cx"), col("cy"),
        struct((col("n") - col("zn")).as("drop"), (-col("idx")).as("ni"),
          (col("ny") * ncols + col("nx")).as("dst")).as("cand"))
      .groupBy("cx", "cy").agg(max("cand").as("b"))
    val ptr = best.where(col("b.drop") > 0)
      .select((col("cy") * ncols + col("cx")).as("src"),
        col("b.dst").as("dst"))
    val resolved = graft.graph.PointerDoubling.resolve(ptr, maxRounds = 24)
    val ids = cells.select((col("cy") * ncols + col("cx")).as("src"))
    ids.join(resolved, Seq("src"), "left")
      .select(coalesce(col("dst"), col("src")).as("sink"))
      .groupBy("sink").agg(count(lit(1)).as("basin_cells"))
      .select((col("sink") % ncols).as("sink_cx"),
        expr(s"sink div $ncols").as("sink_cy"), col("basin_cells"))
  }
}
