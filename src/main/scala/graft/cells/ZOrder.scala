package graft.cells

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) data-layout clustering as pure codegen'd column
  * arithmetic — the write-side twin of [[CellIndex.interleave]] (which is
  * the Scala-side kernel used by the cell sources). Interleaving the bits
  * of the two lattice axes makes rows that are close in 2-D close in the
  * sort order, so range-partitioning + sorting by the z-value gives every
  * data file a TIGHT min/max envelope on BOTH axes — which is what turns
  * the manifest's per-column stats ([[graft.table.SnapshotTable]]) into
  * 2-D data skipping. This is exactly Iceberg/Delta z-order clustering,
  * built from five shift-or-mask stages per axis (no UDF: the whole
  * expression stays inside whole-stage codegen).
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to even bit positions (0, 2, 4, …). */
  private def spread16(v: Column): Column = {
    val m0 = v.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two 16-bit lattice coordinates (ix in the even
    * bits, iy in the odd bits) — a total order that interleaves the two
    * axes. */
  def zvalue(ix: Column, iy: Column): Column =
    spread16(ix).bitwiseOR(shiftleft(spread16(iy), 1))
}
