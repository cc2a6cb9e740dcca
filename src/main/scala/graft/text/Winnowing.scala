package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, "Local
  * algorithms for document fingerprinting", SIGMOD 2003 — the MOSS
  * algorithm): hash every character k-gram, slide a w-wide window over
  * the per-document hash sequence, keep each window's minimum hash; the
  * distinct kept hashes are the document's fingerprint set. Guarantee:
  * any shared substring of length >= w + k - 1 contributes at least one
  * shared fingerprint, so plagiarism/boilerplate overlap is detected
  * without comparing texts.
  *
  * Scale shape: gram hashing is a narrow per-doc explode; the winnow is a
  * doc-PARTITIONED window (never the single-partition global sort); pair
  * generation drops ubiquitous fingerprints (doc frequency > maxDocFreq)
  * BEFORE the self-join — the stop-fingerprint cut that keeps boilerplate
  * from squaring the join at corpus scale. Only (doc_id, 128-bit fp) rows
  * ever shuffle.
  */
object Winnowing {

  /** `docs(doc_id, text)` → distinct `(doc_id, fp)` fingerprints over the
    * first `maxChars` characters (k-gram size `k`, winnow window `w`). */
  def fingerprints(docs: DataFrame, k: Int, w: Int, maxChars: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    require(w >= 1, s"w must be >= 1: $w")
    require(maxChars >= k, s"maxChars must be >= k: $maxChars vs $k")
    val grams = docs
      .select(col("doc_id"), substring(col("text"), 1, maxChars).as("t"))
      .withColumn("np", length(col("t")) - (k - 1))
      .where(col("np") >= w) // need at least one full winnow window
      .select(col("doc_id"), col("np"),
        explode(sequence(lit(1), col("np"))).as("i"),
        col("t"))
      .select(col("doc_id"), col("np"), col("i"),
        md5(col("t").substr(col("i"), lit(k)).cast("binary")).as("h"))
    val win = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("fp", min(col("h")).over(win))
      // only windows that fit entirely inside the gram sequence
      .where(col("i") <= col("np") - (w - 1))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }

  /** Document pairs sharing >= `minShared` fingerprints, after dropping
    * fingerprints present in more than `maxDocFreq` documents (and those
    * in only one — they can't form a pair). Output
    * `(doc_a, doc_b, n_shared)` with doc_a < doc_b. */
  def sharedPairs(fps: DataFrame, maxDocFreq: Int, minShared: Int): DataFrame = {
    require(maxDocFreq >= 2, s"maxDocFreq must be >= 2: $maxDocFreq")
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val rare = fps.groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= maxDocFreq)
      .select("fp")
    val kept = fps.join(rare, "fp")
    val a = kept.select(col("fp"), col("doc_id").as("doc_a"))
    val b = kept.select(col("fp"), col("doc_id").as("doc_b"))
    a.join(b, "fp")
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
