package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Real gzip decode through the multimodal batch path: byte-exact round
  * trips (including empty and multi-byte UTF-8), fail-loud on corrupt or
  * truncated frames. */
class GzipSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false").appName("gzip-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("gzip round trip is byte-exact, including empty and multi-byte UTF-8") {
    import spark.implicits._
    val texts = Seq(
      (1L, ""),
      (2L, "plain ascii words"),
      (3L, "ünïcøde — 多字节 ✓"),
      (4L, "x" * 100000)) // compressible run
    val media = texts.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        MultimodalOps.gzipUdf(col("text")).as("media"))
    val facts = MultimodalOps.decompressGzipFacts(media, "doc_id", "media")
    val joined = media.select(col("doc_id").as("id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("exp_bytes"),
        md5(encode(col("text"), "UTF-8")).as("exp_md5"))
      .join(facts, "id").collect()
    assert(joined.length == 4)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_bytes") == r.getAs[Long]("exp_bytes"))
      assert(r.getAs[String]("x_md5") == r.getAs[String]("exp_md5"))
    }
  }

  test("compression actually compresses the compressible payload") {
    import spark.implicits._
    val sz = Seq((1L, "y" * 50000)).toDF("doc_id", "text")
      .select(length(MultimodalOps.gzipUdf(col("text"))).as("z"))
      .head().getInt(0)
    assert(sz < 1000, s"50k-run compressed to $sz bytes?")
  }

  test("corrupt magic and truncated frames fail loudly") {
    import spark.implicits._
    val bad = Seq((1L, Array[Byte](0x12, 0x34, 0x56, 0x78))).toDF("doc_id", "media")
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.decompressGzipFacts(bad, "doc_id", "media").collect()
    }
    assert(e.getMessage != null)

    val full = Seq((1L, "some payload to truncate")).toDF("doc_id", "text")
      .select(col("doc_id"), MultimodalOps.gzipUdf(col("text")).as("media"))
      .head().getAs[Array[Byte]]("media")
    val trunc = Seq((1L, full.take(full.length - 5))).toDF("doc_id", "media")
    intercept[org.apache.spark.SparkException] {
      MultimodalOps.decompressGzipFacts(trunc, "doc_id", "media").collect()
    }
  }
}
