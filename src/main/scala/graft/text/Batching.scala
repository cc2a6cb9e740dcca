package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed batch assembly for training: group documents of
  * similar token length, fill fixed-size batches inside each bucket, and
  * account the padding waste — the packing-efficiency step a trainer runs
  * so a 4k-token straggler doesn't pad a whole batch of 200-token docs
  * (the complement of PipelineOps.packSequences, which concatenates; this
  * operator BATCHES, the shape attention kernels with per-sample padding
  * need).
  *
  * Deterministic: bucket = len div bucketWidth, batch fill order is doc
  * id — reproducible on any engine/partitioning, append-stable within a
  * bucket's id order. The only window is PARTITIONED BY bucket; at crawl
  * scale a bucket is bounded by the length distribution (and a hot bucket
  * salts the same way q133's top-k does — the id order inside each batch
  * is arbitrary for training, so per-salt filling is semantics-preserving).
  */
object Batching {

  /** `(id, text)` → per (bucket, batch): `n_docs`, `max_len`, `sum_len`,
    * and `pad_waste` = n_docs·max_len − sum_len (the tokens a rectangular
    * batch tensor pads). */
  def lengthBucketedBatches(docs: DataFrame, idCol: String, textCol: String,
                            bucketWidth: Int = 16, batchSize: Int = 8): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0,
      s"bucketWidth/batchSize must be positive: $bucketWidth/$batchSize")
    docs
      .select(col(idCol).as("id"),
        size(split(col(textCol), " ")).cast("long").as("n"))
      .withColumn("bucket", expr(s"n div $bucketWidth"))
      .withColumn("batch",
        ((row_number().over(Window.partitionBy("bucket").orderBy("id")) - 1)
          / batchSize).cast("long"))
      .groupBy("bucket", "batch")
      .agg(count(lit(1)).as("n_docs"), max("n").as("max_len"),
        sum("n").as("sum_len"))
      .select(col("bucket"), col("batch"), col("n_docs"), col("max_len"),
        (col("max_len") * col("n_docs") - col("sum_len")).as("pad_waste"))
  }
}
