package graft.cells

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raster map algebra over lattice cells: focal (moving-window)
  * statistics — each cell aggregates the values of its (2r+1)² Moore
  * neighborhood. The raster analog of the reference's raster→vector
  * regrid semantics (computeGridGOES-style neighborhood processing,
  * declared a non-goal as a TOOL but whose kernel shape belongs in the
  * engine): smoothing a page-density surface, spreading a coverage
  * mask, computing local crawl-intensity gradients.
  *
  * Plan: scatter-gather, not windows — each input cell explodes to its
  * (2r+1)² recipient coordinates (a narrow literal-array explode), one
  * hash aggregation on the recipient key, then an equi-join back onto
  * the input cells (same key, co-partitioned after the agg — AQE reuses
  * the exchange). No sort, no window frame, no driver collect: the
  * plan at 10^12 cells is two shuffles of (int, int, long) rows.
  * Boundary semantics: the neighborhood is whatever neighbors EXIST
  * (edge cells aggregate fewer contributors — `n_nbrs` reports how
  * many), matching raster tools' default edge handling.
  */
object FocalOps {

  /** Per-cell neighborhood sum + contributor count over a value raster.
    * Input: one row per cell `(ixCol, iyCol, vCol)` (caller pre-aggregates
    * duplicates). Output: (ix, iy, v, focal_sum, n_nbrs) — focal_sum
    * includes the cell's own value (standard focal convention). */
  def focalSum(df: DataFrame, ixCol: String, iyCol: String, vCol: String,
               radius: Int): DataFrame = {
    require(radius >= 1 && radius <= 8,
      s"radius $radius out of sane range 1..8 ((2r+1)^2 explode per cell)")
    val offsets = for { dx <- -radius to radius; dy <- -radius to radius }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val cells = df.select(col(ixCol).cast("long").as("ix"),
      col(iyCol).cast("long").as("iy"), col(vCol).cast("long").as("v"))
    val scattered = cells
      .select(col("ix"), col("iy"), col("v"),
        explode(array(offsets: _*)).as("o"))
      .select((col("ix") + col("o.dx")).as("ix"),
        (col("iy") + col("o.dy")).as("iy"), col("v"))
      .groupBy("ix", "iy")
      .agg(sum(col("v")).as("focal_sum"), count(lit(1)).as("n_nbrs"))
    cells.join(scattered, Seq("ix", "iy"))
      .select(col("ix"), col("iy"), col("v"), col("focal_sum"),
        col("n_nbrs"))
  }
}
