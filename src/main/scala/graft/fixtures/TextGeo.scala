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
