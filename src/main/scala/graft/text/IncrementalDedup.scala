package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection: a NEW crawl batch against the
  * already-indexed CORPUS. Both sides compute MinHash band keys map-side,
  * but the candidate join is new×corpus ONLY — corpus×corpus pairs (found
  * when the corpus was indexed) are never re-enumerated, so a batch ingest
  * costs O(|batch| × collision rate) instead of re-running the full-corpus
  * self-join: the shape an hourly ingest against a 100 TB index needs (the
  * corpus-side band table is exactly what a snapshot table persists
  * between ingests; here it is recomputed because the fixture is small).
  *
  * Same completeness regime as TextOps.minHashLshPairs: with bands·rows
  * chosen so P(miss | jac ≥ τ) is negligible (32×2 at τ = 0.8 →
  * (1−0.8²)³² ≈ 6e-15), the LSH candidate set is indistinguishable from
  * exact, and every candidate is verified with an exact Jaccard on the
  * hashed shingle sets — the oracle recomputes the same pairs from raw
  * shingles. */
object IncrementalDedup {

  /** `(new_id, old_id, jac ≥ tau)` pairs, exact-verified. */
  def newVsCorpusPairs(corpus: DataFrame, batch: DataFrame,
                       idCol: String, textCol: String,
                       n: Int = 3, numHashes: Int = 64, bands: Int = 32,
                       tau: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide $numHashes")
    val rows = numHashes / bands
    def prep(df: DataFrame): DataFrame = df
      .select(col(idCol).as("id"),
        TextOps.minhashSigUdf(n, numHashes)(col(textCol)).as("sig"),
        TextHash.shingleHashSetUdf(n)(col(textCol)).as("shs"))
      .where(size(col("shs")) > 0)
      .transform(graft.spark.PersistTracker.persist) // band pass + verify pass
    def bandsOf(df: DataFrame): DataFrame = df.select(col("id"),
      explode(TextOps.bandKeysUdf(bands, rows)(col("sig"))).as("band_key"))
    val c = prep(corpus)
    val b = prep(batch)
    val cands = bandsOf(b).select(col("id").as("new_id"), col("band_key"))
      .join(bandsOf(c).select(col("id").as("old_id"), col("band_key")),
        "band_key")
      .select("new_id", "old_id")
      .distinct()
    cands
      .join(b.select(col("id").as("new_id"), col("shs").as("shs_n")), "new_id")
      .join(c.select(col("id").as("old_id"), col("shs").as("shs_o")), "old_id")
      .withColumn("jac", TextHash.jaccardUdf(col("shs_n"), col("shs_o")))
      .where(col("jac") >= tau)
      .select("new_id", "old_id", "jac")
  }
}
