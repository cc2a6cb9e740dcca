package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived corpora over the driver's `documents`/`embeddings` tables, with
  * engineered duplicates/near-duplicates so dedup operators have non-empty,
  * oracle-checkable output. Twin SQL in the oracle entries. */
object TextFixtures {

  /** documents ∪ exact copies of every 5th doc (id+100000). */
  def dupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.select(col("doc_id"), col("text"))
      .unionByName(d.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  val dupCorpusSql: String =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0""".stripMargin

  /** documents ∪ near-dup copies (1 appended token → Jaccard ≈ (n-2)/(n-1)). */
  def nearDupCorpus(spark: SparkSession, dir: String, suffix: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.select(col("doc_id"), col("text"))
      .unionByName(d.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(suffix)).as("text")))
  }

  def nearDupCorpusSql(suffix: String): String =
    s"""SELECT doc_id, text FROM documents
       |UNION ALL SELECT doc_id + 100000, text || '$suffix' FROM documents""".stripMargin

  /** embeddings ∪ identical copies of every 10th vector (id+10000):
    * identical vectors are found by sign-LSH with probability 1, so the
    * LSH near-dup output equals the exact-pairs oracle. */
  def embedDupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    e.select(col("vec_id"), col("embedding"))
      .unionByName(e.where(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
  }

  val embedDupCorpusSql: String =
    """SELECT vec_id, embedding FROM embeddings
      |UNION ALL SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id % 10 = 0""".stripMargin

  /** documents with engineered multi-paragraph text: every even doc gains a
    * shared "subscribe" boilerplate paragraph, every third doc a shared
    * "rights" footer — so paragraph-level dedup has real cross-document
    * repeats while each doc's own body stays unique. */
  def paraCorpus(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0,
            lit("\n\nsubscribe to the newsletter and share this page"))
            .otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
            lit("\n\nall rights reserved contact us terms of service"))
            .otherwise(lit(""))).as("text"))

  // NB: no continuation line may START with '||' — these strings are
  // re-embedded inside outer stripMargin oracle blocks (SparkEntry
  // discipline), which would strip the first pipe of a leading '||'.
  val paraCorpusSql: String =
    """SELECT doc_id, text ||
      |  (CASE WHEN doc_id % 2 = 0
      |      THEN chr(10)||chr(10)||'subscribe to the newsletter and share this page'
      |      ELSE '' END) ||
      |  (CASE WHEN doc_id % 3 = 0
      |      THEN chr(10)||chr(10)||'all rights reserved contact us terms of service'
      |      ELSE '' END) AS text
      |FROM documents""".stripMargin

  /** Benchmark n-gram set for decontamination: every 25th doc contributes
    * its first 8 tokens as one "eval set" n-gram (every doc has ≥ 10
    * tokens, so the window always exists). */
  def benchmarkNgrams(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 25 === 0)
      .select(concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("ngram"))

  val benchmarkNgramsSql: String =
    """SELECT array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS ngram
      |FROM documents WHERE doc_id % 25 = 0""".stripMargin

  /** Synthetic URL per doc with the classic canonicalization noise: upper
    * case scheme/host, explicit default port, tracking params, fragment.
    * Path uses doc_id % 50 so distinct raw URLs collapse to shared
    * canonical forms. */
  def urlCorpus(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat(lit("HTTPS://WWW.Example"), (col("doc_id") % 7).cast("string"),
          lit(".COM:443/p/"), (col("doc_id") % 50).cast("string"),
          when(col("doc_id") % 2 === 0,
            concat(lit("?utm_source=feed&id="), (col("doc_id") % 4).cast("string")))
            .otherwise(concat(lit("?ref="), (col("doc_id") % 13).cast("string"))),
          lit("#s"), (col("doc_id") % 5).cast("string")).as("url"))

  val urlCorpusSql: String =
    """SELECT doc_id, 'HTTPS://WWW.Example' || (doc_id % 7) ||
      |  '.COM:443/p/' || (doc_id % 50) ||
      |  (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&id=' || (doc_id % 4)
      |      ELSE '?ref=' || (doc_id % 13) END) ||
      |  '#s' || (doc_id % 5) AS url
      |FROM documents""".stripMargin

  /** documents with deterministic PII appended: every 4th doc an email,
    * every 5th a phone, every 7th an IPv4 — overlapping moduli give docs
    * with multiple PII kinds. */
  def piiCorpus(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 4 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example"), (col("doc_id") % 3).cast("string"), lit(".com")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" call 555-"),
              lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"),
              lit("."), (col("doc_id") % 100).cast("string")))
            .otherwise(lit(""))).as("text"))

  val piiCorpusSql: String =
    """SELECT doc_id, text ||
      |  (CASE WHEN doc_id % 4 = 0
      |      THEN ' contact user' || doc_id || '@example' || (doc_id % 3) || '.com'
      |      ELSE '' END) ||
      |  (CASE WHEN doc_id % 5 = 0
      |      THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
      |           '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      ELSE '' END) ||
      |  (CASE WHEN doc_id % 7 = 0
      |      THEN ' host 10.0.' || (doc_id % 256) || '.' || (doc_id % 100)
      |      ELSE '' END) AS text
      |FROM documents""".stripMargin

  /** Ordered language-ID profiles drawn from the documents vocabulary so
    * the argmax is non-degenerate on this corpus. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast"),
    "de" -> Seq("table", "batch", "der"),
    "es" -> Seq("data", "row", "la"),
    "fr" -> Seq("query", "line", "le"),
    "zh" -> Seq("spark", "window", "shi"))

  val qualityStopwords: Seq[String] = Seq("the", "a", "of", "and", "is")
}
