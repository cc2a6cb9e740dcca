package graft.text

import org.apache.spark.sql.DataFrame
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
    * first `maxChars` characters (k-gram size `k`, winnow window `w`).
    *
    * Computed entirely DOC-LOCALLY with array higher-order functions: the
    * per-doc gram hashes are one `transform`, each window minimum one
    * `array_min(slice(...))`, per-doc dedup one `array_distinct` — all
    * inside a single narrow projection. The earlier formulation exploded
    * every gram (~maxChars rows/doc), shuffled them into a per-doc window
    * sort, and paid a second global exchange for the distinct; the winnow
    * is a local algorithm (Schleimer et al. §4), so NO exchange is
    * fundamentally required before pair generation — now none happens
    * (values are unchanged: same md5 over the same byte spans, same
    * string-min per window, same per-doc fingerprint set). */
  def fingerprints(docs: DataFrame, k: Int, w: Int, maxChars: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    require(w >= 1, s"w must be >= 1: $w")
    require(maxChars >= k, s"maxChars must be >= k: $maxChars vs $k")
    docs
      .select(col("doc_id"), substring(col("text"), 1, maxChars).as("t"))
      .withColumn("np", length(col("t")) - (k - 1))
      .where(col("np") >= w) // need at least one full winnow window
      .withColumn("hs", expr(
        s"transform(sequence(1, np), i -> md5(cast(substr(t, i, $k) as binary)))"))
      .select(col("doc_id"),
        explode(expr(
          s"array_distinct(transform(sequence(1, np - ${w - 1}), " +
            s"i -> array_min(slice(hs, i, $w))))")).as("fp"))
  }

  /** Document pairs sharing >= `minShared` fingerprints, after dropping
    * fingerprints present in more than `maxDocFreq` documents (and those
    * in only one — they can't form a pair). Output
    * `(doc_a, doc_b, n_shared)` with doc_a < doc_b. */
  def sharedPairs(fps: DataFrame, maxDocFreq: Int, minShared: Int): DataFrame = {
    require(maxDocFreq >= 2, s"maxDocFreq must be >= 2: $maxDocFreq")
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    // one pass decides keep/drop: a windowed doc-frequency count over the
    // fp partitioning replaces the earlier aggregate + semi-join (which
    // re-ran the fingerprint subtree); persisted because both sides of
    // the pair self-join consume it
    val kept = fps
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .where(col("__df") >= 2 && col("__df") <= maxDocFreq)
      .select("doc_id", "fp")
      .transform(graft.spark.PersistTracker.persist)
    val a = kept.select(col("fp"), col("doc_id").as("doc_a"))
    val b = kept.select(col("fp"), col("doc_id").as("doc_b"))
    a.join(b, "fp")
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
