package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class WavEnergySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("wav-energy-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def wav(data: Array[Byte], junk: Int = 0): Array[Byte] =
    Containers.Wav.write(8000, 1, 8, data, junkChunks = junk, junkLen = 5)

  test("Wav.data returns the exact PCM slice through junk chunks") {
    val pcm = Array.tabulate[Byte](48)(i => (i * 11 + 3).toByte)
    assert(Containers.Wav.data(wav(pcm, junk = 3)).toSeq === pcm.toSeq)
  }

  test("frame energy matches a local reference, incl. a partial tail frame") {
    val s = spark
    import s.implicits._
    val pcm = Array.tabulate[Byte](150)(i => ((i * 7 + 90) % 256).toByte)
    val df = Seq((5L, wav(pcm, junk = 2))).toDF("doc_id", "media")
    val got = MultimodalOps.decodeWavFrameEnergy(df, "doc_id", "media", frameLen = 64)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val want = pcm.grouped(64).zipWithIndex.map { case (fr, i) =>
      i.toLong -> fr.map(b => { val d = (b & 0xff) - 128; d.toLong * d }).sum
    }.toMap
    assert(got === want)
    assert(want.size === 3) // 64 + 64 + 22-sample tail
  }

  test("non-8-bit-mono payloads and corrupt bytes fail loud") {
    val s = spark
    import s.implicits._
    val stereo = Containers.Wav.write(8000, 2, 16, new Array[Byte](32))
    val e = intercept[Exception] {
      MultimodalOps.decodeWavFrameEnergy(
        Seq((1L, stereo)).toDF("doc_id", "media"), "doc_id", "media").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("8-bit mono"), msgs.take(300))
    intercept[IllegalArgumentException](
      Containers.Wav.data("not a riff file at all".getBytes("US-ASCII")))
  }
}
