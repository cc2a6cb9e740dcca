package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Per-file Bloom-filter data skipping for POINT LOOKUPS on columns the
  * table is NOT clustered by — the secondary-index complement to the
  * min/max manifest stats ([[SnapshotTable]]) and the z-order/Hilbert
  * sort keys, which only prune on the clustering axes. Iceberg/Delta
  * ship the same idea as parquet bloom filters / file-level index
  * structures.
  *
  * Representation: each file's filter is the SORTED SET of occupied bit
  * positions (k deterministic xxhash64 probes per key, mod `mbits`) —
  * semantically identical to the bitmap (no false negatives, bounded
  * false positives) while staying a plain array column any engine can
  * store in a manifest sidecar. The index is file-count-sized (manifest
  * scale, not data scale): building it is one pass over the table; a
  * probe touches only the index plus the surviving files. */
object BloomIndex {

  /** The k bit positions of `key` (a long column) as an array column. */
  def probeBits(key: Column, mbits: Int, k: Int): Column =
    array((0 until k).map(i => pmod(xxhash64(key, lit(i)), lit(mbits))): _*)

  /** One pass over the files under `path` → `(file, bits)` with `bits`
    * the sorted distinct bit positions set by that file's keys. */
  def build(spark: SparkSession, path: String, keyCol: String,
            mbits: Int, k: Int): DataFrame =
    spark.read.parquet(path)
      .select(input_file_name().as("file"),
        explode(probeBits(col(keyCol).cast("long"), mbits, k)).as("bit"))
      .distinct()
      .groupBy("file").agg(sort_array(collect_set("bit")).as("bits"))

  /** Files that may contain any of `keys` (single long-key column named
    * `key`): a file qualifies for a key iff ALL k probe bits are set.
    * The index side is file-count-sized; keys are a broadcast probe. */
  def candidateFiles(index: DataFrame, keys: DataFrame,
                     mbits: Int, k: Int): DataFrame =
    index.join(
        broadcast(keys.select(probeBits(col("key"), mbits, k).as("kbits"))))
      .where(expr("forall(kbits, b -> array_contains(bits, b))"))
      .select("file").distinct()
}
