package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class WarcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("warc-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sampleFile(gz: Boolean): Array[Byte] = Warc.writeFile(Seq(
    Warc.warcinfoRecord("f.warc", 1600000000L),
    Warc.requestRecord("https://a.org/1", 1600000100L),
    Warc.responseRecord("https://a.org/1", 1600000100L, "<p>one</p>".getBytes("UTF-8")),
    Warc.requestRecord("https://b.org/2", 1600000200L),
    Warc.responseRecord("https://b.org/2", 1600000200L, "second body".getBytes("UTF-8"))),
    gzipPerRecord = gz)

  test("round-trip: every record walks back out, responses carry HTTP facts") {
    val recs = Warc.parse(sampleFile(gz = false))
    assert(recs.map(_.warcType) === Seq("warcinfo", "request", "response",
      "request", "response"))
    val r1 = recs(2)
    assert(r1.targetUri === "https://a.org/1")
    assert(r1.epochSec === 1600000100L)
    assert(r1.httpStatus === 200)
    assert(r1.httpContentType === "text/html; charset=UTF-8")
    assert(new String(r1.body, "UTF-8") === "<p>one</p>")
    assert(new String(recs(4).body, "UTF-8") === "second body")
    // non-response records keep raw content and status -1
    assert(recs(0).httpStatus === -1)
    assert(new String(recs(0).body, "US-ASCII").startsWith("software:"))
  }

  test("gzip-member file auto-detects and parses identically") {
    val gz = sampleFile(gz = true)
    assert((gz(0) & 0xff) === 0x1f && (gz(1) & 0xff) === 0x8b)
    val plain = Warc.parse(sampleFile(gz = false))
    val unpacked = Warc.parse(gz)
    assert(unpacked.map(r => (r.warcType, r.targetUri, r.epochSec, r.httpStatus,
        r.body.toSeq)) ===
      plain.map(r => (r.warcType, r.targetUri, r.epochSec, r.httpStatus,
        r.body.toSeq)))
  }

  test("header names are case-insensitive; unknown fields are ignored") {
    val body = "HTTP/1.1 200 OK\r\ncontent-type: text/plain\r\n\r\nhi"
      .getBytes("US-ASCII")
    val rec = ("WARC/1.0\r\nwarc-type: response\r\nWARC-TARGET-URI: http://x/9\r\n" +
      "X-Custom-Field: whatever\r\nwarc-date: 2020-09-13T12:26:40Z\r\n" +
      s"content-length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++
      body ++ "\r\n\r\n".getBytes("US-ASCII")
    val r = Warc.parse(rec)
    assert(r.length === 1)
    assert(r.head.targetUri === "http://x/9")
    assert(r.head.epochSec === 1600000000L)
    assert(r.head.httpContentType === "text/plain")
    assert(new String(r.head.body, "UTF-8") === "hi")
  }

  test("malformed input fails loudly, never drops records silently") {
    val good = sampleFile(gz = false)
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'
    assertThrows[IllegalArgumentException](Warc.parse(badMagic))
    // truncated mid-content
    assertThrows[IllegalArgumentException](
      Warc.parse(java.util.Arrays.copyOfRange(good, 0, good.length - 30)))
    // missing Content-Length
    val noLen = ("WARC/1.1\r\nWARC-Type: request\r\n\r\n" + "x\r\n\r\n")
      .getBytes("US-ASCII")
    assertThrows[IllegalArgumentException](Warc.parse(noLen))
    // content block not CRLF-CRLF terminated
    val badEnd = ("WARC/1.1\r\nWARC-Type: request\r\nContent-Length: 2\r\n\r\n" +
      "ab??" + "\r\n\r\n").getBytes("US-ASCII").dropRight(4)
    assertThrows[IllegalArgumentException](Warc.parse(badEnd))
  }

  test("gzip expansion cap: bombs fail loudly, the floor admits small " +
       "well-compressed payloads") {
    // cap arithmetic: 16 MiB floor, then 1024x the compressed size
    assert(Warc.inflateCap(100) == (16L << 20))
    assert(Warc.inflateCap(1 << 20) == (1L << 20) * Warc.MaxInflateRatio)
    // a highly compressible payload against an artificially small cap
    // trips the guard with a clear message instead of inflating unbounded
    val zeros = new Array[Byte](1 << 20)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(zeros); gz.close()
    val compressed = bos.toByteArray
    val e = intercept[IllegalArgumentException](
      Warc.gunzipAll(compressed, cap = 1024L))
    assert(e.getMessage.contains("gzip bomb"))
    // under the real cap the same payload inflates fine
    assert(Warc.gunzipAll(compressed,
      Warc.inflateCap(compressed.length)).length == zeros.length)
  }

  test("responses operator: one row per response, narrow shuffle-free plan") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, sampleFile(gz = false)), (1L, sampleFile(gz = true)))
      .toDF("file_id", "warc")
    val out = Warc.responses(df, "warc")
    assert(out.count() === 4) // 2 responses per file; request/warcinfo dropped
    val uris = out.select("uri").collect().map(_.getString(0)).sorted
    assert(uris === Array("https://a.org/1", "https://a.org/1",
      "https://b.org/2", "https://b.org/2"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"ingest must be narrow:\n$plan")
  }

  test("WET conversion records round-trip with Refers-To and text/plain") {
    val bytes = Warc.writeFile(Seq(
      Warc.warcinfoRecord("f.warc.wet", 1600000000L),
      Warc.conversionRecord("https://a.org/1", 1600000100L,
        "one extracted".getBytes("UTF-8")),
      Warc.conversionRecord("https://b.org/2", 1600000200L,
        "two".getBytes("UTF-8"))),
      gzipPerRecord = true)
    val recs = Warc.parse(bytes)
    assert(recs.map(_.warcType) === Seq("warcinfo", "conversion", "conversion"))
    assert(new String(recs(1).body, "UTF-8") === "one extracted")
    // the serialized header block carries the back-reference + content type
    val raw = new String(Warc.conversionRecord("https://a.org/1", 0L,
      Array.emptyByteArray).takeWhile(_ != 0), "US-ASCII")
    assert(raw.contains("WARC-Refers-To: "))
    assert(raw.contains("Content-Type: text/plain"))
    // conversions operator: one row per conversion record, narrow plan
    val s = spark
    import s.implicits._
    val out = Warc.conversions(Seq(Tuple1(bytes)).toDF("wet"), "wet")
    assert(out.count() === 2)
    assert(out.select("uri").collect().map(_.getString(0)).sorted ===
      Array("https://a.org/1", "https://b.org/2"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"WET walk must be narrow:\n$plan")
  }
}
