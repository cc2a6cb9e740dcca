package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (rsync/LBFS-style CDC) for shift-robust
  * dedup: chunk boundaries fall where a rolling hash of the trailing
  * `w` characters hits `0 mod divisor`, so boundaries RE-SYNCHRONIZE a
  * few characters after any insertion/deletion — a prefix edit that
  * shifts every byte breaks fixed-offset chunking completely but leaves
  * almost every CDC chunk intact. The chunk-hash table is the unit of
  * cross-document dedup (storage dedup, near-identical page detection),
  * complementary to shingles (q14) and winnowing (q171): those sample
  * k-grams; CDC partitions the text.
  *
  * Determinism + oracle parity: the rolling hash is an integer fold
  * `h = (h·31 + code) mod 1000003` over a length-`w` window — Spark's
  * `aggregate(…, 0L, …)` and DuckDB's `list_reduce` (first-element
  * init) agree exactly because the first fold step from 0 yields the
  * first code. Everything is per-row higher-order-function codegen —
  * no UDF, no shuffle until the chunk-hash aggregation.
  *
  * Scale: the per-row cost is O(len·w) with these expressions (fine for
  * page-sized text); the chunk join shuffles (doc_id, md5) pairs only,
  * with a doc-frequency cap pruning ubiquitous chunks before the pair
  * self-join (the q171 winnowing discipline). */
object Chunking {

  final val Mod = 1000003L

  /** `(idCol, textCol)` → `(doc_id, chunk_md5)`, distinct per doc.
    * Chunks are the substrings between rolling-hash boundaries
    * (`h(i) % divisor == 0` for the window ending at 1-based `i`,
    * `i >= w`), plus the tail. */
  def chunks(df: DataFrame, idCol: String, textCol: String,
             w: Int, divisor: Int): DataFrame = {
    require(w >= 2 && divisor >= 2, s"w=$w divisor=$divisor")
    df.select(col(idCol).as("doc_id"), col(textCol).as("t"))
      .withColumn("codes",
        expr("transform(filter(split(t, ''), c -> c <> ''), c -> ascii(c))"))
      // guard: Spark's sequence(a, b) DESCENDS when b < a, so a doc
      // shorter than the window must yield no boundaries, not a reversed
      // position walk
      .withColumn("bs", expr(
        s"""case when size(codes) >= $w then
           |  filter(sequence($w, size(codes)),
           |    i -> aggregate(slice(codes, i - $w + 1, $w), 0L,
           |           (a, x) -> (a * 31 + x) % $Mod) % $divisor = 0)
           |else array() end""".stripMargin))
      .withColumn("cuts", expr("concat(array(0), bs, array(size(codes)))"))
      // per-doc dedup happens doc-locally (array_distinct over the chunk
      // hashes) — all of a doc's chunks live in one array, so the earlier
      // global DISTINCT exchange bought nothing
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(
          |  filter(transform(sequence(2, size(cuts)),
          |    k -> substring(t, element_at(cuts, k - 1) + 1,
          |                   element_at(cuts, k) - element_at(cuts, k - 1))),
          |    c -> c <> ''),
          |  c -> md5(c)))""".stripMargin)).as("chunk_md5"))
  }

  /** Pairs of docs sharing >= `minShared` chunks, restricted to chunks
    * with document frequency <= `maxDocFreq` (boilerplate chunks never
    * enter the self-join). */
  def sharedPairs(chunks: DataFrame, maxDocFreq: Int,
                  minShared: Int): DataFrame = {
    // persisted: both sides of the pair self-join consume `rare`; without
    // it the chunking expressions + df-window run once per side
    val rare = chunks
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("chunk_md5")))
      .where(col("df") <= maxDocFreq)
      .select("doc_id", "chunk_md5")
      .transform(graft.spark.PersistTracker.persist)
    rare.as("a").join(rare.as("b"), Seq("chunk_md5"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }
}
