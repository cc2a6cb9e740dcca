package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-level bucketing: write a table hash-partitioned into a fixed
  * bucket count on the join key, so every equi-join between co-bucketed
  * tables runs WITHOUT a shuffle exchange on either side — the physical
  * design that makes the recurring joins of a 100 TB store (pages ⋈
  * page-stats, postings ⋈ doc-lengths, captures ⋈ robots-decisions) a
  * scan-local operation instead of a full-corpus exchange every batch.
  * Spark's bucketBy is the Hive-compatible layout Catalyst recognizes:
  * `FileSourceScanExec.outputPartitioning = HashPartitioning(key,
  * buckets)`, which SortMergeJoin accepts as-is (BucketedJoinSpec asserts
  * the exchange-free plan).
  *
  * The table is registered in the session catalog with an explicit
  * external `path` — overwrite-idempotent, unique per (tag,
  * applicationId) at the call sites, so concurrent Verify/Bench runs
  * never race on one location. */
object Bucketed {

  /** Write `df` as a bucketed external parquet table and return the
    * catalog read-back (whose scan carries the bucket layout). Buckets
    * are sorted on the key so the merge side of a join needs no sort. */
  def writeTable(df: DataFrame, name: String, path: String,
                 buckets: Int, keyCol: String): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .option("path", path)
      .saveAsTable(name)
    df.sparkSession.table(name)
  }
}
