package graft.cells

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raster-algebra toolkit over per-cell count grids — the Spark-native
  * computational core of the reference's raster tools (regridding,
  * morphological cleanup, raster→vector extraction; cf.
  * `src/raster/computeGridGOES.cpp` regrid + `allocateGOES2WRFGrid`,
  * whose GRIB/HDF readers are a declared non-goal but whose grid
  * semantics live here). Everything operates on an (cx, cy, c) count
  * table: grid-sized inputs, grid-sized exchanges, exact integers only.
  *
  * Common discipline: the lattice is GENERATED (`spark.range`, never
  * shuffled), counts left-join onto it so empty cells are explicit
  * zeros, and neighborhoods are 8/4-offset explode + equi-join — the
  * Autocorr/Density adjacency shape. No window, no float.
  */
object Raster {

  private def lattice(df: DataFrame, ncols: Int, nrows: Int): DataFrame = {
    val spark = df.sparkSession
    spark.range(ncols.toLong * nrows)
      .select((col("id") % ncols).as("cx"), expr(s"id div $ncols").as("cy"))
      .join(df.select(col("cx"), col("cy"), col("c")), Seq("cx", "cy"),
        "left")
      .select(col("cx"), col("cy"), coalesce(col("c"), lit(0L)).as("c"))
  }

  /** Factor-2 bilinear refinement: the `ncols`×`nrows` count grid
    * resampled at the 2× grid's cell centers with border replication.
    * A fine cell's center sits 1/4 cell off its parent coarse center, so
    * the 4 contributing coarse cells carry exact weights {9,3,3,1}/16 —
    * returned UNnormalized as `v16` = 16·value (pure integers, engine-
    * independent). One generated fine lattice, a 4-way offset explode,
    * one equi-join against the coarse grid, one keyed sum. */
  def bilinearRefine(counts: DataFrame, ncols: Int, nrows: Int)
      : DataFrame = {
    val spark = counts.sparkSession
    val coarse = lattice(counts, ncols, nrows)
      .select(col("cx").as("sx"), col("cy").as("sy"), col("c"))
    val fine = spark.range(4L * ncols * nrows)
      .select((col("id") % (2 * ncols)).as("fx"),
        expr(s"id div ${2 * ncols}").as("fy"))
      .select(col("fx"), col("fy"),
        expr("fx div 2").as("ix"), (col("fx") % 2).as("px"),
        expr("fy div 2").as("iy"), (col("fy") % 2).as("py"))
      // the off-axis neighbor (parity decides the side), border-clamped
      .select(col("fx"), col("fy"), col("ix"), col("iy"),
        least(greatest(col("ix") + col("px") * 2 - 1, lit(0L)),
          lit(ncols - 1L)).as("ox"),
        least(greatest(col("iy") + col("py") * 2 - 1, lit(0L)),
          lit(nrows - 1L)).as("oy"))
    val taps = fine.select(col("fx"), col("fy"), explode(array(
        struct(col("ix").as("sx"), col("iy").as("sy"), lit(9L).as("w")),
        struct(col("ox").as("sx"), col("iy").as("sy"), lit(3L).as("w")),
        struct(col("ix").as("sx"), col("oy").as("sy"), lit(3L).as("w")),
        struct(col("ox").as("sx"), col("oy").as("sy"), lit(1L).as("w"))))
        .as("t"))
      .select(col("fx"), col("fy"), col("t.sx").as("sx"),
        col("t.sy").as("sy"), col("t.w").as("w"))
    taps.join(coarse, Seq("sx", "sy"))
      .groupBy("fx", "fy").agg(sum(col("w") * col("c")).as("v16"))
  }

  /** Morphological opening of the density mask `c ≥ threshold`: erosion
    * (a cell survives iff its full closed 3×3 neighborhood is dense —
    * off-lattice neighbors count as empty) then dilation of the eroded
    * set (a cell turns on iff ANY closed-3×3 neighbor survived erosion).
    * Removes isolated dense specks and thin bridges without shrinking
    * solid blobs — the standard denoise before vectorizing. Returns one
    * row per lattice cell: (cx, cy, dense, opened) as 0/1. */
  def morphOpen(counts: DataFrame, ncols: Int, nrows: Int,
                threshold: Long): DataFrame = {
    val cells = lattice(counts, ncols, nrows)
      .select(col("cx"), col("cy"),
        (col("c") >= threshold).cast("long").as("dense"))
      .transform(graft.spark.PersistTracker.persist)
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    def closedNbrSum(src: DataFrame, vCol: String): DataFrame =
      src.select(col("cx"), col("cy"), col(vCol).as("v"),
          explode(typedLit(offsets)).as("o"))
        .select((col("cx") + col("o._1")).as("nx"),
          (col("cy") + col("o._2")).as("ny"), col("v"))
        .groupBy(col("nx").as("cx"), col("ny").as("cy"))
        .agg(sum("v").as("nsum"))
    val eroded = cells.join(closedNbrSum(cells, "dense"), Seq("cx", "cy"))
      .select(col("cx"), col("cy"), col("dense"),
        (col("nsum") === 9L).cast("long").as("er"))
      .transform(graft.spark.PersistTracker.persist)
    eroded.join(closedNbrSum(eroded, "er"), Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"), col("dense"),
        (coalesce(col("nsum"), lit(0L)) > 0L).cast("long").as("opened"))
  }

  /** Marching squares over the density mask `c ≥ threshold`: every 2×2
    * cell block (top-left at bx ∈ [0, ncols−2], by ∈ [0, nrows−2]) is
    * classified by its corner pattern `case_id = c00 + 2·c10 + 4·c01 +
    * 8·c11`; cases 0/15 emit no contour segment, the two diagonal
    * saddles (6 = c10+c01, 9 = c00+c11) emit 2, every other case 1 —
    * the raster→vector isoline census.
    * Returns one row per OCCURRING case: (case_id, n_blocks, n_segments).
    * Block classification is one 4-tap gather join; the result is ≤ 16
    * rows. */
  def marchingSquares(counts: DataFrame, ncols: Int, nrows: Int,
                      threshold: Long): DataFrame = {
    val spark = counts.sparkSession
    val cells = lattice(counts, ncols, nrows)
      .select(col("cx"), col("cy"),
        (col("c") >= threshold).cast("long").as("d"))
    val blocks = spark.range((ncols - 1L) * (nrows - 1L))
      .select((col("id") % (ncols - 1)).as("bx"),
        expr(s"id div ${ncols - 1}").as("by"))
    val taps = blocks.select(col("bx"), col("by"), explode(typedLit(
        Seq((0, 0, 1L), (1, 0, 2L), (0, 1, 4L), (1, 1, 8L)))).as("o"))
      .select(col("bx"), col("by"),
        (col("bx") + col("o._1")).as("cx"),
        (col("by") + col("o._2")).as("cy"), col("o._3").as("bit"))
    val cases = taps.join(cells, Seq("cx", "cy"))
      .groupBy("bx", "by").agg(sum(col("bit") * col("d")).as("case_id"))
    cases.groupBy("case_id")
      .agg(count(lit(1)).as("n_blocks"))
      .withColumn("n_segments", col("n_blocks") *
        when(col("case_id") === 0L || col("case_id") === 15L, 0L)
          .when(col("case_id") === 6L || col("case_id") === 9L, 2L)
          .otherwise(1L))
  }
}
