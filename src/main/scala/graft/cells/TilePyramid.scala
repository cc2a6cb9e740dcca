package graft.cells

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Map-tile pyramid aggregation: per-cell page counts at EVERY zoom level
  * 0..maxRes in ONE pass — the web-map / heat-tile pipeline (and the
  * multi-resolution twin of the reference's single-grid cell aggregation).
  * A point on the `2^bits`-wide integer lattice lands in tile
  * `(xi div 2^(bits-r), yi div 2^(bits-r))` at zoom `r`; exploding the
  * zoom sequence BEFORE the aggregate turns the whole pyramid into one
  * partial-aggregated integer rollup keyed on (res, ix, iy).
  *
  * Scale: the explode multiplies only (xi, yi) int pairs — (maxRes+1)×
  * row fan-out of 16-byte rows, then map-side combine collapses them to
  * the tile population BEFORE the exchange (a zoom-0 tile absorbs the
  * whole planet's count in each partition's combiner). The alternative —
  * maxRes+1 separate aggregations — would scan the corpus maxRes+1
  * times. The 2^k tile arithmetic stays exact in both engines as
  * integer division by an exactly-representable power of two. */
object TilePyramid {

  def pyramidCounts(df: DataFrame, xiCol: String, yiCol: String,
                    bits: Int, maxRes: Int): DataFrame = {
    require(maxRes >= 0 && maxRes <= bits && bits <= 30,
      s"need 0 <= maxRes <= bits <= 30, got bits=$bits maxRes=$maxRes")
    df.select(col(xiCol).cast("long").as("__xi"),
        col(yiCol).cast("long").as("__yi"))
      .select(explode(expr(s"sequence(0, $maxRes)")).as("res"),
        col("__xi"), col("__yi"))
      .groupBy(col("res"),
        expr(s"__xi div cast(pow(2, $bits - res) as bigint)").as("ix"),
        expr(s"__yi div cast(pow(2, $bits - res) as bigint)").as("iy"))
      .agg(count(lit(1)).as("n_pages"))
  }

  /** Signed-weight pyramid: the same one-pass rollup summing `wCol` —
    * the DELTA form (+1 inserts, −1 deletes) of incremental pyramid
    * maintenance. */
  def pyramidSum(df: DataFrame, xiCol: String, yiCol: String, wCol: String,
                 bits: Int, maxRes: Int): DataFrame = {
    require(maxRes >= 0 && maxRes <= bits && bits <= 30,
      s"need 0 <= maxRes <= bits <= 30, got bits=$bits maxRes=$maxRes")
    df.select(col(xiCol).cast("long").as("__xi"),
        col(yiCol).cast("long").as("__yi"), col(wCol).cast("long").as("__w"))
      .select(explode(expr(s"sequence(0, $maxRes)")).as("res"),
        col("__xi"), col("__yi"), col("__w"))
      .groupBy(col("res"),
        expr(s"__xi div cast(pow(2, $bits - res) as bigint)").as("ix"),
        expr(s"__yi div cast(pow(2, $bits - res) as bigint)").as("iy"))
      .agg(sum(col("__w")).as("n_pages"))
  }

  /** Incremental maintenance: merge a materialized base pyramid with a
    * signed delta pyramid — full outer join on the tile key, zero tiles
    * dropped. `applyDelta(P(v1), Δ-pyramid) == P(v2)` is the
    * incremental-view-maintenance contract (gated by the q119 oracle,
    * which recomputes P(v2) from scratch).
    *
    * Scale: this is why the pyramid survives a daily 10^9-page recrawl —
    * the base is an artifact read, only the CHANGED pages fan out through
    * the zoom explode, and the merge joins two tile tables whose size is
    * the touched-tile count, not the corpus. */
  def applyDelta(base: DataFrame, delta: DataFrame): DataFrame =
    base.withColumnRenamed("n_pages", "__b")
      .join(delta.withColumnRenamed("n_pages", "__d"),
        Seq("res", "ix", "iy"), "full_outer")
      .select(col("res"), col("ix"), col("iy"),
        (coalesce(col("__b"), lit(0L)) + coalesce(col("__d"), lit(0L)))
          .as("n_pages"))
      .where(col("n_pages") =!= 0)
}
