package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality scoring: train a unigram LM
  * with add-one smoothing on a reference split of the corpus, score every
  * document by its average negative log-likelihood, and bucket into
  * head / middle / tail (the CCNet perplexity-bucket recipe, Wenzek et al.
  * 2020 — public method).
  *
  * Numeric discipline: per-TOKEN-TYPE scores are quantized ONCE to integer
  * micro-nats (round(-ln(p)·1e6) as BIGINT), so every per-document
  * aggregate is an exact integer sum — order-independent across engines
  * and partitionings, which is what lets a DuckDB oracle match the Spark
  * result bit-for-bit (the only float op happens once per vocabulary type,
  * where a 1-ulp libm divergence would need to land exactly on a .5
  * micro-nat boundary to matter).
  *
  * Scale: the LM is a (token → count) table — vocabulary-sized, not
  * corpus-sized. Scoring is explode + hash join on the token + per-doc
  * partial-aggregated sum; the document text never shuffles. At 100 TB the
  * vocab table exceeds broadcast range → the join shuffles tokens (8-byte
  * hash + id would be the slimmer key; kept as the string join here for
  * oracle parity). Bucketing by global ntile is a single-partition window —
  * fine for reports; production pipelines freeze fixed thresholds from a
  * sampled quantile job instead (`bucketByThresholds`). */
object NgramLm {

  /** (w, unll) micro-nat score per vocabulary type, plus the OOV score.
    * denom = N + V (add-one smoothing over N train tokens, V types). */
  def trainUnigram(train: DataFrame, textCol: String): (DataFrame, Long) = {
    val tok = train.select(explode(split(col(textCol), " ")).as("w"))
    val counts = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .transform(graft.spark.PersistTracker.persist)
    val firstRow = counts.agg(sum("c").as("n"), count(lit(1)).as("v")).head()
    require(!firstRow.isNullAt(0) && firstRow.getLong(1) > 0,
      "training split is empty — the LM needs at least one document")
    val denom = (firstRow.getLong(0) + firstRow.getLong(1)).toDouble
    val lm = counts.select(col("w"),
      round(-log((col("c") + lit(1.0)) / lit(denom)) * lit(1e6), 0)
        .cast("long").as("unll"))
    val oov = math.round(-math.log(1.0 / denom) * 1e6)
    (lm, oov)
  }

  /** Score docs under the LM: (id, n_tokens, sum_unll, avg_unll) with
    * avg_unll = sum_unll div n_tokens (exact integer division). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            lm: DataFrame, oovUnll: Long): DataFrame =
    docs.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("w"))
      .join(lm, Seq("w"), "left")
      .select(col("id"), coalesce(col("unll"), lit(oovUnll)).as("unll"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("unll").as("sum_unll"))
      .withColumn("avg_unll", expr("sum_unll div n_tokens"))

  /** head/middle/tail via global tertiles (deterministic total order). */
  def bucketNtile(scored: DataFrame): DataFrame =
    scored.withColumn("ppl_bucket",
      ntile(3).over(Window.orderBy(col("avg_unll"), col("id"))))

  /** Fixed-threshold bucketing — the form that survives 100 TB (thresholds
    * frozen from a sampled quantile job; no global window anywhere). */
  def bucketByThresholds(scored: DataFrame, t1: Long, t2: Long): DataFrame = {
    require(t1 <= t2, s"thresholds out of order: $t1 > $t2")
    scored.withColumn("ppl_bucket",
      when(col("avg_unll") < t1, lit(1))
        .when(col("avg_unll") < t2, lit(2)).otherwise(lit(3)))
  }
}
