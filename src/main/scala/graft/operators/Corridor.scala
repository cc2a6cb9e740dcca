package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.grid.GridSpec

/** Corridor (buffer) join: grid cells within radius `r` of any segment
  * of a polyline layer — the "what's near the road" query (service-area
  * and proximity allocation in the reference's vocabulary, cf. the
  * line-mode weights of `sumpoly.c` which weight by overlap instead of
  * proximity).
  *
  * Plan shape: per segment, enumerate ONLY the candidate cells of its
  * r-expanded bounding box (the cell-cover trick — never segments ×
  * all-cells), then keep candidates passing the EXACT point-to-segment
  * distance test. On the integer lattice every operand (cell center,
  * endpoint, clamp, square) is an exactly-representable double, so the
  * squared distance is exact integer arithmetic and the oracle replays
  * it bit for bit.
  *
  * Axis-aligned segments only (`y1 == y2`), matching the roads fixture;
  * the general form adds the projection clamp on both axes. */
object Corridor {

  /** `segs(id, x1, x2, y)` (x1 <= x2, horizontal) → per cell
    * `(col, row, n_segs, min_d2)` over cells whose CENTER lies within
    * `r` of >= 1 segment. */
  def cellsNear(segs: DataFrame, grid: GridSpec, r: Double): DataFrame = {
    require(r > 0, s"radius must be > 0: $r")
    val g = grid
    val cand = segs
      .withColumn("col", explode(sequence(
        greatest(lit(1), (floor((col("x1") - r - g.xorig) / g.xcell) + 1).cast("int")),
        least(lit(g.ncols), (floor((col("x2") + r - g.xorig) / g.xcell) + 1).cast("int")))))
      .withColumn("row", explode(sequence(
        greatest(lit(1), (floor((col("y") - r - g.yorig) / g.ycell) + 1).cast("int")),
        least(lit(g.nrows), (floor((col("y") + r - g.yorig) / g.ycell) + 1).cast("int")))))
      .withColumn("cx", lit(g.xorig) + (col("col") - 0.5) * g.xcell)
      .withColumn("cy", lit(g.yorig) + (col("row") - 0.5) * g.ycell)
      .withColumn("dx", greatest(lit(0.0), col("x1") - col("cx"),
        col("cx") - col("x2")))
      .withColumn("dy", abs(col("cy") - col("y")))
      .withColumn("d2", col("dx") * col("dx") + col("dy") * col("dy"))
      .where(col("d2") <= r * r)
    cand.groupBy("col", "row")
      .agg(count(lit(1)).as("n_segs"),
        min(col("d2")).cast("long").as("min_d2"))
  }

  /** Map-matching snap: each point to its nearest segment within `r`
    * (ties → smaller segment id), or no row if nothing is in range — the
    * GPS-trace-to-road-network step. Candidates come from joining the
    * point's bucket against each segment's r-expanded bucket cover
    * (never points × segments); the winner is a keyed struct-min, no
    * rank window. `pts(pid, x, y)`, `segs(id, x1, x2, sy)` (horizontal,
    * x1 <= x2) → `(pid, seg_id, d2)`. */
  def snapPoints(pts: DataFrame, segs: DataFrame, bucket: Double,
                 r: Double): DataFrame = {
    require(bucket > 0 && r > 0, s"bucket=$bucket r=$r")
    val segE = segs
      .withColumn("bx", explode(sequence(
        floor((col("x1") - r) / bucket).cast("long"),
        floor((col("x2") + r) / bucket).cast("long"))))
      .withColumn("by", explode(sequence(
        floor((col("sy") - r) / bucket).cast("long"),
        floor((col("sy") + r) / bucket).cast("long"))))
    val ptsE = pts
      .withColumn("bx", floor(col("x") / bucket).cast("long"))
      .withColumn("by", floor(col("y") / bucket).cast("long"))
    ptsE.join(segE, Seq("bx", "by"))
      .withColumn("dx", greatest(lit(0.0), col("x1") - col("x"),
        col("x") - col("x2")))
      .withColumn("dy", abs(col("y") - col("sy")))
      .withColumn("d2", col("dx") * col("dx") + col("dy") * col("dy"))
      .where(col("d2") <= r * r)
      .groupBy("pid")
      .agg(min(struct(col("d2"), col("id"))).as("m"))
      .select(col("pid"), col("m.id").as("seg_id"),
        col("m.d2").cast("long").as("d2"))
  }
}
