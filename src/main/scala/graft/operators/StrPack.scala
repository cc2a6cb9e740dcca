package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort-Tile-Recursive (STR) packing (Leutenegger et al. 1997) — the
  * bulk-load order for spatial indexes and the file-layout rule for a
  * geo-partitioned lake: rank by x into vertical slices, rank by y inside
  * each slice into tiles, and each tile becomes a leaf / file whose bbox
  * is near-minimal. The layout is what makes bbox file-skipping work at
  * 100 TB — a query window touches O(√files) leaves instead of all.
  *
  * Both ranking phases use a DISTRIBUTED rank (range-repartition →
  * partition-local row_number + broadcast partition offsets) — the
  * classic two-phase global rank, never a single-partition window. The
  * result is partitioning-independent: ranks are the positions in the
  * strict total order (v, id), whatever boundaries the range sampler
  * picked. */
object StrPack {

  /** Global/grouped rank: position (1-based) of each row in the strict
    * total order (v, id) within its group (grpCols empty → global).
    * Shuffle: ONE range repartition; the offset table is (partitions ×
    * groups) rows — broadcast-sized. */
  def groupedRank(df: DataFrame, grpCols: Seq[String], v: String,
                  id: String, out: String): DataFrame = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val keyCols = (grpCols :+ v :+ id).map(col)
    // persisted: the range partitioner SAMPLES boundaries per execution,
    // so the offset pass and the rank pass must see the same __pid map
    val parted = df.repartitionByRange(parts, keyCols: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(graft.spark.PersistTracker.persist)
    val grpW = if (grpCols.isEmpty) Window.orderBy("__pid")
      else Window.partitionBy(grpCols.map(col): _*).orderBy("__pid")
    val offs = parted.groupBy(("__pid" +: grpCols).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum("__c").over(grpW.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__c")
    val localW = Window.partitionBy(("__pid" +: grpCols).map(col): _*)
      .orderBy(col(v), col(id))
    parted.join(broadcast(offs), "__pid" +: grpCols)
      .withColumn(out, col("__off") + row_number().over(localW))
      .drop("__pid", "__off")
  }

  /** df(id, x, y, …) → + (slice, tile, leaf): STR leaf assignment into
    * `slices` × `tiles` leaves, balanced to ±1 row by exact integer rank
    * arithmetic (slice = ((rx−1)·slices) div n). */
  def pack(df: DataFrame, xCol: String, yCol: String, idCol: String,
           slices: Int, tiles: Int): DataFrame = {
    require(slices >= 1 && tiles >= 1, s"bad STR shape: $slices x $tiles")
    val ranked = groupedRank(df, Nil, xCol, idCol, "__rx")
    val n = broadcast(ranked.agg(count(lit(1)).as("__n")))
    val sliced = ranked.crossJoin(n)
      .withColumn("slice", expr(s"((__rx - 1) * $slices) div __n"))
      .drop("__rx", "__n")
    val ry = groupedRank(sliced, Seq("slice"), yCol, idCol, "__ry")
    val m = broadcast(ry.groupBy("slice").agg(count(lit(1)).as("__m")))
    ry.join(m, "slice")
      .withColumn("tile", expr(s"((__ry - 1) * $tiles) div __m"))
      .withColumn("leaf", col("slice") * tiles + col("tile"))
      .drop("__ry", "__m")
  }
}
