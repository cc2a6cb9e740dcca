package graft.cells

import graft.geom.Geo.BBox

/** Hierarchical spatial cell index (H3/S2-style, implemented from scratch —
  * no external index library ships in this environment).
  *
  * Scheme: a quadtree over a fixed planar domain. At resolution r the domain
  * is a 2^r × 2^r lattice; a cell id packs (resolution, morton(ix, iy)) into
  * one Long: id = (r << 58) | interleave(ix, iy). Morton interleaving keeps
  * spatially-near cells numerically near, which matters at 100 TB: parquet
  * min/max stats on the cell column give effective data-skipping, and
  * range-partitioning by cell id approximates spatial locality across
  * executors.
  *
  * Replaces the reference's per-feature bbox OVERLAP2 prefilter
  * (mims_spatl.h:76-81, intersect.c:67-128) with an equi-joinable key:
  * explode(coverCells(geom)) → hash join on cell — the only spatial-join
  * strategy that scales horizontally.
  */
final case class CellDomain(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  def width: Double = xmax - xmin
  def height: Double = ymax - ymin
}

object CellIndex {
  final val MaxRes = 28 // 2^28 per axis; 56 bits of morton + 5 bits res

  /** Morton-interleave two 28-bit ints. */
  def interleave(ix: Long, iy: Long): Long = {
    var x = ix; var y = iy
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    y = (y | (y << 16)) & 0x0000FFFF0000FFFFL
    y = (y | (y << 8))  & 0x00FF00FF00FF00FFL
    y = (y | (y << 4))  & 0x0F0F0F0F0F0F0F0FL
    y = (y | (y << 2))  & 0x3333333333333333L
    y = (y | (y << 1))  & 0x5555555555555555L
    x | (y << 1)
  }

  def deinterleave(m: Long): (Long, Long) = {
    def compact(v0: Long): Long = {
      var v = v0 & 0x5555555555555555L
      v = (v | (v >> 1))  & 0x3333333333333333L
      v = (v | (v >> 2))  & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v >> 4))  & 0x00FF00FF00FF00FFL
      v = (v | (v >> 8))  & 0x0000FFFF0000FFFFL
      v = (v | (v >> 16)) & 0x00000000FFFFFFFFL
      v
    }
    (compact(m), compact(m >> 1))
  }

  /** Integer lattice coords of (x,y) at resolution r, clamped to the domain. */
  def latticeCoords(x: Double, y: Double, d: CellDomain, res: Int): (Long, Long) = {
    val n = 1L << res
    val ix = math.min(n - 1, math.max(0L, math.floor((x - d.xmin) / d.width * n).toLong))
    val iy = math.min(n - 1, math.max(0L, math.floor((y - d.ymin) / d.height * n).toLong))
    (ix, iy)
  }

  /** Point → cell id at resolution r. */
  def encode(x: Double, y: Double, d: CellDomain, res: Int): Long = {
    val (ix, iy) = latticeCoords(x, y, d, res)
    (res.toLong << 58) | interleave(ix, iy)
  }

  def resolutionOf(id: Long): Int = (id >>> 58).toInt
  def cellCoords(id: Long): (Long, Long) = deinterleave(id & ((1L << 58) - 1))

  def cellBBox(id: Long, d: CellDomain): BBox = {
    val r = resolutionOf(id)
    val n = 1L << r
    val (ix, iy) = cellCoords(id)
    BBox(d.xmin + d.width * ix / n, d.ymin + d.height * iy / n,
         d.xmin + d.width * (ix + 1) / n, d.ymin + d.height * (iy + 1) / n)
  }

  /** All cell ids at resolution r overlapping a bbox — the generator behind
    * the spatial join's explode side. Bounded: callers pick r so the cover
    * stays small relative to row width (a polygon covering k cells produces
    * k join rows). */
  def coverCells(b: BBox, d: CellDomain, res: Int): IndexedSeq[Long] = {
    // max side is exclusive (a bbox ending exactly on a lattice line does not
    // spill into the next cell) — but degenerate zero-extent sides must still
    // cover their own cell, so only step down when the side has extent
    val xhi = if (b.xmax > b.xmin) math.nextDown(b.xmax) else b.xmax
    val yhi = if (b.ymax > b.ymin) math.nextDown(b.ymax) else b.ymax
    val (ix0, iy0) = latticeCoords(b.xmin, b.ymin, d, res)
    val (ix1, iy1) = latticeCoords(xhi, yhi, d, res)
    for {
      iy <- iy0 to iy1
      ix <- ix0 to ix1
    } yield (res.toLong << 58) | interleave(ix, iy)
  }

  /** Adaptive cover: the cells of the COARSEST resolution ≤ maxRes at which
    * the bbox covers at most `maxCells` cells (S2-style covering). Huge
    * geometries emit a few coarse cells instead of thousands of fine ones —
    * bounding the explode factor of mixed-size layers; tiny geometries keep
    * maxRes selectivity. Ids carry their resolution, so multi-resolution
    * joins stay plain equi-joins (probes enumerate ancestor levels). */
  def adaptiveCover(b: BBox, d: CellDomain, maxRes: Int,
                    maxCells: Int = 4): IndexedSeq[Long] = {
    var r = maxRes
    while (r > 0) {
      val c = coverCells(b, d, r)
      if (c.length <= maxCells) return c
      r -= 1
    }
    coverCells(b, d, 0)
  }

  /** The cell ids of (x, y) at EVERY resolution 0..maxRes — the probe keys
    * of a multi-resolution join (one per level, maxRes+1 total). */
  def ancestors(x: Double, y: Double, d: CellDomain, maxRes: Int): Array[Long] =
    Array.tabulate(maxRes + 1)(r => encode(x, y, d, r))

  /** k-ring: all cells within Chebyshev distance k of a cell — the kNN
    * expansion neighborhood (replaces the reference's ANN kd-tree,
    * geo_functions.cpp:3958-4060). */
  def kRing(id: Long, k: Int): IndexedSeq[Long] = {
    val r = resolutionOf(id)
    val n = 1L << r
    val (cx, cy) = cellCoords(id)
    for {
      dy <- -k to k
      dx <- -k to k
      ix = cx + dx if ix >= 0 && ix < n
      iy = cy + dy if iy >= 0 && iy < n
    } yield (r.toLong << 58) | interleave(ix, iy)
  }

  /** Cells exactly on the ring at Chebyshev distance k (incremental widening). */
  def ringAt(id: Long, k: Int): IndexedSeq[Long] = {
    if (k == 0) return IndexedSeq(id)
    val r = resolutionOf(id)
    val n = 1L << r
    val (cx, cy) = cellCoords(id)
    for {
      dy <- -k to k
      dx <- -k to k
      if math.max(math.abs(dx), math.abs(dy)) == k
      ix = cx + dx if ix >= 0 && ix < n
      iy = cy + dy if iy >= 0 && iy < n
    } yield (r.toLong << 58) | interleave(ix, iy)
  }
}
