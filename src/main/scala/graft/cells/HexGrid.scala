package graft.cells

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hexagonal cell binning — the H3-style companion to the square
  * quadtree index (`CellIndex`): pointy-top hexagons of size `s`
  * (center-to-vertex), axial coordinates (hq, hr) via the classic
  * fractional-axial → cube-round pipeline. Hexagons give ~13% lower
  * max-distance-to-center than squares of equal area and exactly 6
  * equidistant neighbors, which is why H3 picked them for coverage
  * analytics; here they are a second, drop-in cell vocabulary for the
  * same groupBy/equi-join discipline.
  *
  * Engine-exactness: every step is deterministic IEEE double arithmetic —
  * √3 enters ONLY as the decimal literal 1.7320508075688772, rounding is
  * floor(x+0.5) (no banker's ambiguity), and ties resolve by the fixed
  * cube-round branch order (largest residual recomputed). The DuckDB
  * twin replays the identical expression tree, so axial ids match
  * bit-for-bit (the q146-dHash double-discipline).
  *
  * Scale shape: binning is a pure codegen projection (no UDF, no
  * shuffle); per-hex counts are one keyed groupBy; hex adjacency is a
  * 6-offset explode + equi-join (one FEWER wasted neighbor than the
  * square queen's 8 — diagonal leakage does not exist on a hex grid).
  */
object HexGrid {

  final val Sqrt3 = 1.7320508075688772

  /** Append axial hex coordinates (`hq`, `hr`) of each (xCol, yCol)
    * point on a pointy-top hex grid of size `s`. */
  def attach(df: DataFrame, xCol: String, yCol: String, s: Double,
             hqName: String = "hq", hrName: String = "hr"): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    // fractional axial coords
    val qf = (lit(Sqrt3) / 3.0 * x - y / 3.0) / s
    val rf = (y * 2.0 / 3.0) / s
    val sf = -qf - rf
    // cube round: round each, then fix the axis with the largest residual
    def rnd(c: Column): Column = floor(c + 0.5)
    val (rq, rr, rs) = (rnd(qf), rnd(rf), rnd(sf))
    val (dq, dr, ds) = (abs(rq - qf), abs(rr - rf), abs(rs - sf))
    val hq = when(dq > dr && dq > ds, -rr - rs).otherwise(rq)
    val hr = when(!(dq > dr && dq > ds) && dr > ds, -rq - rs).otherwise(rr)
    df.withColumn(hqName, hq.cast("long"))
      .withColumn(hrName, hr.cast("long"))
  }

  /** The identical binning as a DuckDB SQL fragment over columns
    * `x`/`y` — the oracle twin of [[attach]]. Yields expressions for
    * (hq, hr) usable in a SELECT. */
  def axialSql(s: Double): (String, String) = {
    val qf = s"((1.7320508075688772 / 3.0 * x - y / 3.0) / $s)"
    val rf = s"((y * 2.0 / 3.0) / $s)"
    val sf = s"(-$qf - $rf)"
    val rq = s"floor($qf + 0.5)"
    val rr = s"floor($rf + 0.5)"
    val rs = s"floor($sf + 0.5)"
    val dq = s"abs($rq - $qf)"
    val dr = s"abs($rr - $rf)"
    val ds = s"abs($rs - $sf)"
    val hq = s"CAST(CASE WHEN $dq > $dr AND $dq > $ds THEN -$rr - $rs " +
      s"ELSE $rq END AS BIGINT)"
    val hr = s"CAST(CASE WHEN NOT ($dq > $dr AND $dq > $ds) AND $dr > $ds " +
      s"THEN -$rq - $rs ELSE $rr END AS BIGINT)"
    (hq, hr)
  }

  /** Hex grid distance between two axial cells:
    * (|Δq| + |Δr| + |Δq+Δr|) / 2 — exact integers. */
  def hexDist(q1: Column, r1: Column, q2: Column, r2: Column): Column =
    // |Δq|+|Δr|+|Δq+Δr| is always even, so the halving is exact
    ((abs(q1 - q2) + abs(r1 - r2) + abs(q1 + r1 - q2 - r2)) / 2)
      .cast("long")

  /** The 6 axial neighbor offsets of a pointy-top hex. */
  val neighbors: Seq[(Int, Int)] =
    Seq((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))

  /** 6-neighbor focal sum over a per-hex count table (hq, hr, c):
    * each hex's count plus its ring-1 neighborhood — the hex twin of the
    * square focal ops, one offset explode + keyed sum. Returns
    * (hq, hr, c, focal). */
  def focalSum(counts: DataFrame): DataFrame = {
    val scatter = counts.select(col("hq"), col("hr"), col("c"),
        explode(typedLit((0, 0) +: neighbors)).as("o"))
      .select((col("hq") + col("o._1")).as("nq"),
        (col("hr") + col("o._2")).as("nr"), col("c"))
      .groupBy(col("nq").as("hq"), col("nr").as("hr"))
      .agg(sum("c").as("focal"))
    counts.join(scatter, Seq("hq", "hr"))
      .select(col("hq"), col("hr"), col("c"), col("focal"))
  }
}
