package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class NormalizeDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .appName("normalize-dedup-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("normalization collapses case/punct/whitespace variants only") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello world"),
      (3L, "HELLO   world..."),
      (4L, "hello worlds"), // different token: own group
      (5L, "unrelated text here")).toDF("doc_id", "text")
    val got = NormalizeDedup.dupGroups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 3L)))
  }

  test("normalizedCol is idempotent") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq("A!  b C??  d9", "  x  ", "...", "MiXeD CaSe 42")
      .toDF("t")
    val twice = texts.select(
        NormalizeDedup.normalizedCol(col("t")).as("once"))
      .select(col("once"),
        NormalizeDedup.normalizedCol(col("once")).as("again"))
      .collect()
    twice.foreach(r => assert(r.getString(0) === r.getString(1)))
  }
}
