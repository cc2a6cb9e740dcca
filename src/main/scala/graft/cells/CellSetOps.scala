package graft.cells

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed set operations over CellIndex cell ids (H3-style
  * `compact`/`uncompact`): a coverage expressed as fine-resolution cells
  * is collapsed to the minimal mixed-resolution set covering the same
  * area — every complete quad of siblings is replaced by its parent,
  * recursively. Crawl-scale use: a geotagged page coverage (or a
  * modeling-domain mask) stored as a cell set shrinks ~4× per fully
  * covered level, and downstream cell-cover joins probe the compacted
  * set via `CellIndex.ancestors` (one hash per resolution) instead of
  * one row per fine cell.
  *
  * Reference analog: the adaptive multi-resolution bins srgcreate builds
  * per feature (sumpoly.c's grid bucketing); here the adaptivity is over
  * an arbitrary cell SET, as a log-depth DataFrame iteration.
  */
object CellSetOps {

  private val MortonMask = (1L << 58) - 1

  /** Compact a distinct cell set: for each resolution r (finest first),
    * replace every complete 4-sibling group by its parent at r−1, then
    * recurse — parents formed at r can merge again at r−1, so a fully
    * covered region collapses all the way up.
    *
    * Plan: one exchange per level (a single window keyed on the parent id
    * computes both the sibling count and the representative), levels =
    * max resolution in the set (≤ 28, typically ≤ 10) — O(log n) rounds,
    * each strictly smaller than the last; per-round localCheckpoint cuts
    * the lineage like the kNN / connected-components loops. */
  def compactCells(df: DataFrame, cellCol: String): DataFrame = {
    var cur = df.select(col(cellCol).cast("long").as("cell")).distinct()
      .localCheckpoint(true)
    val maxResRow = cur.agg(max(shiftright(col("cell"), 58))).head()
    if (maxResRow.isNullAt(0)) return cur
    val maxRes = maxResRow.getLong(0).toInt
    for (r <- maxRes to 1 by -1) {
      val isR = shiftright(col("cell"), 58) === r
      val parent = shiftleft(lit((r - 1).toLong), 58)
        .bitwiseOR(shiftright(col("cell").bitwiseAND(lit(MortonMask)), 2))
      // only the current resolution enters the window — pass-through cells
      // of other resolutions would otherwise pile into one null-key
      // partition (a single straggler task at scale)
      val w = Window.partitionBy("__par")
      val merged = cur.where(isR)
        .withColumn("__par", parent)
        .withColumn("__c", count(lit(1)).over(w))
        .withColumn("__rep", min(col("cell")).over(w))
        .where(col("__c") =!= 4 || col("cell") === col("__rep"))
        .select(when(col("__c") === 4, col("__par")).otherwise(col("cell"))
          .as("cell"))
      cur = cur.where(!isR).unionByName(merged).localCheckpoint(true)
    }
    cur
  }

  /** Uncompact: expand every cell coarser than `res` to its descendants
    * AT `res` (cells already at `res` pass through; finer cells are
    * rejected — uncompacting below the set's finest resolution is a
    * caller bug). Explode of 4^(res−r) children per row — narrow, no
    * shuffle. */
  def uncompactCells(df: DataFrame, cellCol: String, res: Int): DataFrame = {
    require(res >= 0 && res <= CellIndex.MaxRes, s"resolution $res out of range")
    val cells = df.select(col(cellCol).cast("long").as("cell"))
    val expand = udf { (cell: Long) =>
      val cr = (cell >>> 58).toInt
      require(cr <= res, s"cell at resolution $cr is finer than target $res")
      val base = (cell & MortonMask) << (2 * (res - cr))
      val n = 1L << (2 * (res - cr))
      (0L until n).map(i => (res.toLong << 58) | (base | i))
    }
    cells.select(explode(expand(col("cell"))).as("cell"))
  }
}
