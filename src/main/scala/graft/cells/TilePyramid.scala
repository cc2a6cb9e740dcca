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
}
