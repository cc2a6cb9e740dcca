package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure-JVM WARC (Web ARChive, ISO 28500) reader/writer and the Spark
  * ingest operator over it — the container format a crawl-scale corpus
  * actually arrives in (Common Crawl ships `.warc.gz` chunks of ~1 GB,
  * each a concatenation of per-record gzip members).
  *
  * Format, per the public ISO 28500 / WARC 1.1 spec: a file is a sequence
  * of records; each record is a `WARC/1.x` version line, named header
  * fields (case-insensitive names), a blank CRLF line, exactly
  * `Content-Length` bytes of content block, then CRLF CRLF. Response
  * records carry an HTTP message (`application/http;msgtype=response`)
  * whose own head/body split is the first CRLF CRLF.
  *
  * Scale shape: one row = one WARC file (a multi-record chunk), parsing is
  * per-row and embarrassingly parallel — the operator is a narrow
  * flatMap with no shuffle, the 100 TB ingest plan (files are the
  * parallelism unit exactly as on a real cluster reading a crawl bucket).
  * The writers exist for fixture synthesis and round-trip specs.
  *
  * Reference behavior anchor: the reference's ingest layer reads its own
  * container formats by walking declared record lengths and validating
  * headers before trusting payloads (e.g. shapefile record headers,
  * io/Shapefile.scala); the WARC walk applies the same
  * declared-length-plus-guard discipline to the web-crawl container.
  */
object Warc {

  private final val Crlf = "\r\n"

  /** One parsed record. `httpStatus`/`httpContentType`/`body` are filled
    * for HTTP-response records; other types carry the raw content block in
    * `body` with status -1. */
  final case class Record(warcType: String, targetUri: String, epochSec: Long,
                          httpStatus: Int, httpContentType: String,
                          body: Array[Byte])

  // ------------------------------------------------------------- writers

  private def record(fields: Seq[(String, String)], content: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder("WARC/1.1").append(Crlf)
    fields.foreach { case (k, v) => head.append(k).append(": ").append(v).append(Crlf) }
    head.append("Content-Length: ").append(content.length).append(Crlf).append(Crlf)
    val hb = head.toString.getBytes("US-ASCII")
    val out = new Array[Byte](hb.length + content.length + 4)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(content, 0, out, hb.length, content.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Deterministic record id (the spec requires a URI; uuid-shaped here,
    * derived from the target so fixtures are reproducible). */
  private def recordId(seed: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"<urn:uuid:${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-${h.substring(16, 20)}-${h.substring(20)}>"
  }

  private def isoDate(epochSec: Long): String =
    java.time.Instant.ofEpochSecond(epochSec).toString

  /** An HTTP-response record wrapping `body` as a 200 text/html message. */
  def responseRecord(uri: String, epochSec: Long, body: Array[Byte]): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK${Crlf}Content-Type: text/html; charset=UTF-8$Crlf" +
      s"Content-Length: ${body.length}$Crlf$Crlf").getBytes("US-ASCII") ++ body
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> recordId(s"response:$uri"),
      "WARC-Date" -> isoDate(epochSec),
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http;msgtype=response"), http)
  }

  /** The matching request record (parsers must skip it). */
  def requestRecord(uri: String, epochSec: Long): Array[Byte] = {
    val http = (s"GET $uri HTTP/1.1${Crlf}Host: crawl$Crlf$Crlf").getBytes("US-ASCII")
    record(Seq(
      "WARC-Type" -> "request",
      "WARC-Record-ID" -> recordId(s"request:$uri"),
      "WARC-Date" -> isoDate(epochSec),
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http;msgtype=request"), http)
  }

  /** A WET conversion record (the Common Crawl text-extraction sidecar
    * format): `WARC-Type: conversion`, text/plain payload, pointing back
    * at the response it was extracted from via `WARC-Refers-To` (ISO
    * 28500 §6.8 — conversion records reference their source record). */
  def conversionRecord(uri: String, epochSec: Long, text: Array[Byte]): Array[Byte] =
    record(Seq(
      "WARC-Type" -> "conversion",
      "WARC-Record-ID" -> recordId(s"conversion:$uri"),
      "WARC-Refers-To" -> recordId(s"response:$uri"),
      "WARC-Date" -> isoDate(epochSec),
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "text/plain"), text)

  /** A WAT metadata record (the Common Crawl link/metadata sidecar): an
    * `application/json` payload describing the referenced response (ISO
    * 28500 §6.9 metadata records; the JSON envelope shape follows the
    * public WAT convention of url/status/length/links). */
  def watRecord(uri: String, epochSec: Long, json: String): Array[Byte] =
    record(Seq(
      "WARC-Type" -> "metadata",
      "WARC-Record-ID" -> recordId(s"metadata:$uri"),
      "WARC-Refers-To" -> recordId(s"response:$uri"),
      "WARC-Date" -> isoDate(epochSec),
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/json"), json.getBytes("UTF-8"))

  /** The warcinfo record real crawls open every file with. */
  def warcinfoRecord(fileName: String, epochSec: Long): Array[Byte] = {
    val info = s"software: graft$Crlf".getBytes("US-ASCII")
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> recordId(s"warcinfo:$fileName"),
      "WARC-Date" -> isoDate(epochSec),
      "WARC-Filename" -> fileName,
      "Content-Type" -> "application/warc-fields"), info)
  }

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 32)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    try gz.write(b) finally gz.close()
    bos.toByteArray
  }

  /** Concatenate records into one file; `gzipPerRecord` emits each record
    * as its own gzip member (the `.warc.gz` convention — members stay
    * independently seekable in real archives). */
  def writeFile(records: Seq[Array[Byte]], gzipPerRecord: Boolean): Array[Byte] =
    records.map(r => if (gzipPerRecord) gzipMember(r) else r)
      .foldLeft(new java.io.ByteArrayOutputStream()) { (bos, r) => bos.write(r); bos }
      .toByteArray

  // -------------------------------------------------------------- parser

  /** Max decompressed bytes per archive chunk, as a multiple of the
    * compressed size (floored at 16 MiB so tiny well-compressed chunks
    * are never rejected). DEFLATE's theoretical ceiling is ~1032×; real
    * web content sits under ~20×, so 1024× admits every legitimate
    * archive while bounding a gzip-bomb member to a single clear error
    * instead of an executor OOM. */
  val MaxInflateRatio = 1024L

  private[graft] def inflateCap(compressedLen: Int): Long =
    math.max(16L << 20, compressedLen.toLong * MaxInflateRatio)

  private def gunzipAll(b: Array[Byte]): Array[Byte] =
    gunzipAll(b, inflateCap(b.length))

  private[graft] def gunzipAll(b: Array[Byte], cap: Long): Array[Byte] = {
    // GZIPInputStream reads concatenated members transparently
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b), 65536)
    val bos = new java.io.ByteArrayOutputStream(b.length * 3 + 64)
    try {
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) {
        bos.write(buf, 0, n)
        require(bos.size <= cap,
          s"gzip expansion exceeds cap $cap for ${b.length} compressed " +
            "bytes — refusing to inflate (gzip bomb?)")
        n = in.read(buf)
      }
    } finally in.close()
    bos.toByteArray
  }

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    require(i + 1 < b.length, s"unterminated line at offset $from")
    i
  }

  /** Parse every record of a WARC file (plain or gzip-member
    * concatenation, auto-detected). Fails loudly on bad version magic,
    * malformed headers, missing Content-Length, or truncation — a corrupt
    * archive chunk must never silently drop records. */
  def parse(bytes: Array[Byte]): Seq[Record] = {
    val b = if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
                (bytes(1) & 0xff) == 0x8b) gunzipAll(bytes) else bytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    var p = 0
    while (p < b.length) {
      val ve = lineEnd(b, p)
      val version = new String(b, p, ve - p, "US-ASCII")
      require(version.startsWith("WARC/"), s"bad record magic '$version' at $p")
      p = ve + 2
      var warcType = ""; var uri = ""; var date = ""; var clen = -1L
      var blank = false
      while (!blank) {
        val e = lineEnd(b, p)
        if (e == p) blank = true
        else {
          val line = new String(b, p, e - p, "US-ASCII")
          val colon = line.indexOf(':')
          require(colon > 0, s"malformed header '$line'")
          val name = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          name match {
            case "warc-type" => warcType = value
            case "warc-target-uri" => uri = value
            case "warc-date" => date = value
            case "content-length" => clen = value.toLong
            case _ => () // other fields legal and ignored
          }
        }
        p = e + 2
      }
      require(clen >= 0, "record missing Content-Length")
      require(p + clen + 4 <= b.length,
        s"content block overruns file: $clen bytes at $p of ${b.length}")
      val content = java.util.Arrays.copyOfRange(b, p, p + clen.toInt)
      p += clen.toInt
      require(b(p) == '\r' && b(p + 1) == '\n' && b(p + 2) == '\r' && b(p + 3) == '\n',
        s"record not CRLF-CRLF-terminated at $p")
      p += 4
      val epoch = if (date.isEmpty) 0L else java.time.Instant.parse(date).getEpochSecond
      if (warcType == "response") {
        // HTTP head/body split: first CRLF CRLF of the message
        var q = 0
        while (q + 3 < content.length && !(content(q) == '\r' && content(q + 1) == '\n' &&
          content(q + 2) == '\r' && content(q + 3) == '\n')) q += 1
        require(q + 3 < content.length, "HTTP response without head/body split")
        val head = new String(content, 0, q, "US-ASCII")
        val lines = head.split("\r\n")
        val status = lines(0).split(" ")
        require(status.length >= 2 && status(0).startsWith("HTTP/"),
          s"bad HTTP status line '${lines(0)}'")
        val ctype = lines.drop(1).collectFirst {
          case l if l.toLowerCase.startsWith("content-type:") =>
            l.substring(l.indexOf(':') + 1).trim
        }.getOrElse("")
        out += Record(warcType, uri, epoch, status(1).toInt, ctype,
          java.util.Arrays.copyOfRange(content, q + 4, content.length))
      } else out += Record(warcType, uri, epoch, -1, "", content)
    }
    out.toSeq
  }

  // -------------------------------------------------------- Spark operator

  /** Flatten a table of WARC files into one row per HTTP-response record.
    * Narrow flatMap — the only plan nodes are scan → generate → project;
    * a 100 TB crawl parses at file granularity with zero shuffle. Request
    * and warcinfo records are walked (their lengths validated) and
    * dropped. */
  def responses(df: DataFrame, fileCol: String): DataFrame = {
    val parseUdf = udf((bytes: Array[Byte]) =>
      parse(bytes).filter(_.warcType == "response")
        .map(r => (r.targetUri, r.epochSec, r.httpStatus, r.httpContentType, r.body)))
    df.select(explode(parseUdf(col(fileCol))).as("r"))
      .select(col("r._1").as("uri"), col("r._2").as("warc_epoch"),
        col("r._3").as("http_status"), col("r._4").as("content_type"),
        col("r._5").as("body"))
  }

  /** `responses` preserving pass-through columns (e.g. the archive file
    * id, so a WET derivation can regroup extractions per source file). */
  def responsesKeeping(df: DataFrame, fileCol: String,
                       keep: Seq[String]): DataFrame = {
    val parseUdf = udf((bytes: Array[Byte]) =>
      parse(bytes).filter(_.warcType == "response")
        .map(r => (r.targetUri, r.epochSec, r.httpStatus, r.httpContentType, r.body)))
    df.select(keep.map(col) :+ explode(parseUdf(col(fileCol))).as("r"): _*)
      .select(keep.map(col) ++ Seq(col("r._1").as("uri"),
        col("r._2").as("warc_epoch"), col("r._3").as("http_status"),
        col("r._4").as("content_type"), col("r._5").as("body")): _*)
  }

  /** Serialize one WET file: a warcinfo header then one conversion record
    * per extraction, parallel arrays in record order. */
  val wetBuildUdf = udf((fileId: Long, uris: Seq[String], eps: Seq[Long],
                         texts: Seq[Array[Byte]]) =>
    writeFile(
      warcinfoRecord(s"crawl-$fileId.warc.wet", 1600000000L) +:
        uris.indices.map(i => conversionRecord(uris(i), eps(i), texts(i))),
      gzipPerRecord = fileId % 2 == 1))

  /** Flatten WET files into one row per conversion record — the same
    * narrow scan → generate → project shape as `responses`. */
  def conversions(df: DataFrame, fileCol: String): DataFrame = {
    val parseUdf = udf((bytes: Array[Byte]) =>
      parse(bytes).filter(_.warcType == "conversion")
        .map(r => (r.targetUri, r.epochSec, r.body)))
    df.select(explode(parseUdf(col(fileCol))).as("r"))
      .select(col("r._1").as("uri"), col("r._2").as("wet_epoch"),
        col("r._3").as("text"))
  }

  /** Serialize one WAT file: warcinfo then one metadata record per page,
    * parallel arrays in record order. */
  val watBuildUdf = udf((fileId: Long, uris: Seq[String], eps: Seq[Long],
                         jsons: Seq[String]) =>
    writeFile(
      warcinfoRecord(s"crawl-$fileId.warc.wat", 1600000000L) +:
        uris.indices.map(i => watRecord(uris(i), eps(i), jsons(i))),
      gzipPerRecord = fileId % 2 == 1))

  /** Flatten WAT files into one row per metadata record, json as string. */
  def metadataRecords(df: DataFrame, fileCol: String): DataFrame = {
    val parseUdf = udf((bytes: Array[Byte]) =>
      parse(bytes).filter(_.warcType == "metadata")
        .map(r => (r.targetUri, r.epochSec, new String(r.body, "UTF-8"))))
    df.select(explode(parseUdf(col(fileCol))).as("r"))
      .select(col("r._1").as("uri"), col("r._2").as("wat_epoch"),
        col("r._3").as("json"))
  }
}
