package graft.cells

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empirical semivariogram of a lattice value surface — the geostatistics
  * QA companion of the autocorrelation layer (Matheron's estimator):
  *
  *   γ(h) = Σ_{|i−j|²=h} (z_i − z_j)² / (2·N(h))
  *
  * binned by exact integer SQUARED lag distance h = dx²+dy² (no float
  * binning drift), pairs enumerated DIRECTED (both orientations — the
  * estimator is invariant because both sum and count double). Reported
  * as gamma_e6 = trunc(10⁶·γ) — one exact integer division per lag bin.
  *
  * Scale shape: one keyed count groupBy of the point stream builds the
  * surface; pair enumeration is a LITERAL offset explode (all (dx,dy)
  * with 0 < dx²+dy² ≤ maxLagSq) + one grid-keyed equi-join + one
  * bin-keyed aggregate — grid-sized work, never point-pairs, no window,
  * no sort. */
object Variogram {

  /** Semivariogram of per-cell counts of `pts` on the ncols×nrows
    * lattice, for every achievable squared lag ≤ maxLagSq.
    * Output: (dist_sq, n_pairs (directed), sum_sq_diff, gamma_e6). */
  def ofCounts(pts: DataFrame, cxCol: String, cyCol: String,
               ncols: Int, nrows: Int, maxLagSq: Int): DataFrame = {
    require(maxLagSq >= 1 && maxLagSq <= 64,
      s"maxLagSq $maxLagSq out of sane range (offset explode is (2r+1)²)")
    val spark = pts.sparkSession
    val counts = pts.groupBy(col(cxCol).as("cx"), col(cyCol).as("cy"))
      .agg(count(lit(1)).as("c"))
    val cells = spark.range(ncols.toLong * nrows)
      .select((col("id") % ncols).as("cx"), expr(s"id div $ncols").as("cy"))
      .join(counts, Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"), coalesce(col("c"), lit(0L)).as("n"))
      .transform(graft.spark.PersistTracker.persist) // both join sides
    val r = math.sqrt(maxLagSq.toDouble).toInt
    val offsets = for {
      dx <- -r to r; dy <- -r to r
      d2 = dx * dx + dy * dy if d2 > 0 && d2 <= maxLagSq
    } yield (dx, dy, d2)
    cells.select(col("cx"), col("cy"), col("n"),
        explode(typedLit(offsets)).as("o"))
      .select((col("cx") + col("o._1")).as("nx"),
        (col("cy") + col("o._2")).as("ny"), col("n").as("za"),
        col("o._3").as("dist_sq"))
      .join(cells.select(col("cx").as("nx"), col("cy").as("ny"),
        col("n").as("zb")), Seq("nx", "ny"))
      .groupBy("dist_sq")
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("za") - col("zb")) * (col("za") - col("zb")))
          .as("sum_sq_diff"))
      .select(col("dist_sq").cast("long").as("dist_sq"), col("n_pairs"),
        col("sum_sq_diff"),
        expr("(1000000 * sum_sq_diff) div (2 * n_pairs)").as("gamma_e6"))
  }
}
