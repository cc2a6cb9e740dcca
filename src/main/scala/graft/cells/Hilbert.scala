package graft.cells

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hilbert-curve distance as pure codegen'd column arithmetic — the
  * locality-preserving sibling of [[ZOrder]]. Both map the 2-D lattice to
  * a 1-D sort key for range-partitioned clustering + per-file min/max
  * data skipping ([[graft.table.SnapshotTable]] stats); Hilbert's extra
  * property is that CONSECUTIVE curve positions are always lattice
  * neighbors (no Z-shaped jumps), so contiguous curve ranges give files
  * strictly tighter 2-D envelopes than Morton order at the same file
  * count — measurably fewer false-positive file reads per bbox probe.
  *
  * This is the standard base-case-free xy2d recurrence (quadrant digit +
  * rotate/flip, cf. the public-domain formulation on the Hilbert-curve
  * literature): `order` fixed levels, each a handful of bitwise/when
  * expressions — the whole value stays inside whole-stage codegen, no
  * UDF. HilbertSpec certifies the permutation and the unit-step
  * neighbor property exhaustively for orders 2..5.
  */
object Hilbert {

  /** Attach the Hilbert distance of `(ixCol, iyCol)` as `outCol` —
    * THE form to use on data: each of the `order` levels lands in its
    * own named projection, so the plan stays LINEAR in `order`. The
    * pure-Column [[hvalue]] inlines level i's x/y into level i+1 twice,
    * growing the expression tree ~4^order (at order 8 that is a ~65k-node
    * expression — measured 287 s on the sf0.1 bench vs sub-second here);
    * named intermediates are non-cheap and multiply-referenced, which
    * stops CollapseProject from re-inlining them. */
  def attach(df: org.apache.spark.sql.DataFrame, ixCol: String,
             iyCol: String, order: Int, outCol: String)
      : org.apache.spark.sql.DataFrame = {
    require(order >= 1 && order <= 31, s"order must be in 1..31: $order")
    val n = 1L << order
    var d = df
      .withColumn("__hx", col(ixCol).cast("long"))
      .withColumn("__hy", col(iyCol).cast("long"))
      .withColumn("__hd", lit(0L))
    var s = n >> 1
    while (s > 0) {
      d = d
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("__hd", col("__hd") +
          lit(s * s) * (col("__rx") * lit(3L)).bitwiseXOR(col("__ry")))
        // __nx from the OLD pair, then __hy from the OLD __hx, then swap in
        .withColumn("__nx", when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n - 1) - col("__hy"))
              .otherwise(col("__hy"))).otherwise(col("__hx")))
        .withColumn("__hy", when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n - 1) - col("__hx"))
              .otherwise(col("__hx"))).otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
      s >>= 1
    }
    d.withColumn(outCol, col("__hd"))
      .drop("__hx", "__hy", "__hd", "__nx", "__rx", "__ry")
  }

  /** Hilbert distance of `(ix, iy)` on the `2^order × 2^order` lattice;
    * inputs must already lie in `[0, 2^order)`. Pure-Column form — the
    * expression tree grows ~4^order, so keep `order` SMALL (≤ 5); use
    * [[attach]] on data. */
  def hvalue(ix: Column, iy: Column, order: Int): Column = {
    require(order >= 1 && order <= 31, s"order must be in 1..31: $order")
    val n = 1L << order
    var x = ix.cast("long")
    var y = iy.cast("long")
    var d: Column = lit(0L)
    var s = n >> 1
    while (s > 0) {
      val rx = when(x.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      d = d + lit(s * s) * (rx * lit(3L)).bitwiseXOR(ry)
      // rotate/flip the quadrant: on ry=0 swap axes, flipping both when
      // rx=1 (flip-then-swap composed into one conditional per axis)
      val nx = when(ry === 0, when(rx === 1, lit(n - 1) - y).otherwise(y))
        .otherwise(x)
      val ny = when(ry === 0, when(rx === 1, lit(n - 1) - x).otherwise(x))
        .otherwise(y)
      x = nx
      y = ny
      s >>= 1
    }
    d
  }
}
