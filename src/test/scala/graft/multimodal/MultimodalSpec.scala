package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Multimodal plumbing: batch decode schema/partitioning, frame sampling,
  * and stub features feeding the similarity operators. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false").appName("mm-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def media() = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
  }

  test("decodeImageMeta keeps one row per input across partitions, schema typed") {
    val in = media().repartition(7)
    val out = MultimodalOps.decodeImageMeta(in, "doc_id", "media")
    assert(out.count() == in.count())
    assert(out.schema.fieldNames.toSeq ==
      Seq("id", "byteLen", "contentHash", "width", "height"))
    val r = out.where(col("byteLen") <= 0).count()
    assert(r == 0)
  }

  test("frame sampling: ~1 frame per stride·KB, deterministic") {
    val out = media()
      .withColumn("frames", MultimodalOps.frameSampleUdf(col("media"), lit(1)))
      .select(col("doc_id"), size(col("frames")).as("n"),
        length(col("media")).as("len"))
    out.collect().foreach { row =>
      val expected = math.max(1, math.ceil(row.getAs[Int]("len") / 1024.0).toInt)
      assert(row.getAs[Int]("n") == expected)
    }
  }

  test("sampleVideoFrames fans out one row per frame, partition-independent") {
    val in = media()
    val out1 = MultimodalOps.sampleVideoFrames(in, "doc_id", "media", stride = 2)
      .orderBy("id", "frame_idx").collect().map(_.toString).toSeq
    val out7 = MultimodalOps.sampleVideoFrames(in.repartition(7), "doc_id", "media", stride = 2)
      .orderBy("id", "frame_idx").collect().map(_.toString).toSeq
    assert(out1 == out7 && out1.nonEmpty)
    // frame counts follow the stride contract: ceil(len / (1024*stride))
    val counts = MultimodalOps.sampleVideoFrames(in, "doc_id", "media", stride = 2)
      .groupBy("id").count()
      .join(in.select(col("doc_id").as("id"), length(col("media")).as("len")), "id")
      .collect()
    counts.foreach { r =>
      val expected = math.max(1, math.ceil(r.getAs[Int]("len") / 2048.0).toInt)
      assert(r.getAs[Long]("count") == expected)
    }
  }

  test("stub features are unit-scale and feed cosine similarity") {
    val feats = media()
      .withColumn("embedding", MultimodalOps.featureUdf(col("media")))
    val q = feats.where(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("embedding").as("qvec"))
    val c = feats.select(col("doc_id").as("cid"), col("embedding").as("cvec"))
    val top = graft.ml.Similarity.cosineTopK(q, c, k = 3)
    assert(top.count() == q.count() * 3)
    assert(top.agg(max("cos")).collect().head.getDouble(0) <= 1.0)
  }
}
