package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.Pages

/** Round-5 queries: the crawl-adjacent operators added this round, each
  * with a closed-form DuckDB oracle over the driver parquet tables. */
object EntryRound5 {

  private val streamSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Drain a finished memory-sink streaming query into a stable local
    * DataFrame (the q132 harness pattern), then stop the stream. */
  private def drainMemorySink(s: SparkSession,
                              q: org.apache.spark.sql.streaming.StreamingQuery,
                              qname: String): DataFrame = {
    val out = s.createDataFrame(
      java.util.Arrays.asList(s.table(qname).collect(): _*),
      s.table(qname).schema)
    q.stop()
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // real PNG/JPEG decode via the JDK's own javax.imageio readers: every
    // doc becomes a genuinely ENCODED container (even ids → PNG, odd →
    // JPEG) whose raster follows a closed-form synthesis formula; the
    // engine decodes format + dimensions from the header walk, and for the
    // lossless PNG half also the full-decode red-channel sum — so the
    // oracle certifies the decoded raster pixel for pixel, not just the
    // writer/reader pairing (ref: reference raster image handling is a
    // declared non-goal; this is the crawl-pipeline image-meta pass)
    "q137_imageio_meta" -> ((s, dir) => {
      import graft.multimodal.MultimodalOps
      val mkImg = udf((docId: Long, nChars: Long) => {
        val w = (nChars % 64).toInt + 1
        val h = (docId % 48).toInt + 1
        val fmt = if (docId % 2 == 0) "png" else "jpg"
        MultimodalOps.encodeTestImage(fmt, docId, w, h)
      })
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), mkImg(col("doc_id"), col("n_chars")).as("media"))
      MultimodalOps.decodeImageIoFacts(media, "doc_id", "media")
        .orderBy("id")
    }),

    // UPDATE-MODE twin of the q132 CDX capture-dedup state: the
    // flatMapGroupsWithState shape that is right at scale — state-store
    // key is exactly (url, digest), each micro-batch emits only updated
    // keys, event-time timeout bounds the store. The final state is
    // reconstructed from the update stream (min first_ts / max n_caps per
    // key — both monotone) and gated by the SAME batch oracle as q132.
    "q138_cdx_update_stream" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StatefulCrawl
      val mem = MemoryStream[(String, Long, String)](s)
      val qname = s"q138_cdxu_${streamSeq.incrementAndGet()}"
      val q = StatefulCrawl.cdxStateUpdate(
          mem.toDF().toDF("url", "ts", "text"), retention = "3650 days")
        .writeStream.format("memory").queryName(qname)
        .outputMode("update").start()
      val rows = EntryRound4c.captures(s, dir)
        .as[(String, Long, String)].collect()
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      drainMemorySink(s, q, qname)
        .groupBy("url", "digest")
        .agg(min("first_ts").as("first_ts"), max("n_caps").as("n_caps"))
        .orderBy("url", "digest")
    }),

    // UPDATE-MODE twin of the q122 decay-density state: per-(ix, iy) page
    // count and exact-integer decay weight sum through
    // flatMapGroupsWithState with event-time eviction; weights computed
    // upstream by the q115 half-life shift arithmetic, so the state op
    // only ever sees (ix, iy, w, ts). Gated by the q122 batch oracle.
    "q139_decay_update_stream" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StatefulCrawl
      import graft.cells.Freshness
      val mem = MemoryStream[String](s)
      val qname = s"q139_decayu_${streamSeq.incrementAndGet()}"
      val pts = Pages.geotag(mem.toDF().toDF("url"))
        .withColumn("pid",
          regexp_extract(col("url"), "(\\d+)$", 1).cast("long"))
        .withColumn("ts", lit(1600000000L) + col("pid") * 137L)
        .withColumn("age_days",
          expr("(1610000000L - ts) div 86400"))
        .select((col("x") / 512).cast("long").as("ix"),
          (col("y") / 512).cast("long").as("iy"),
          Freshness.halfLifeWeightMicro("age_days", 16).as("w"),
          col("ts"))
      val q = StatefulCrawl.decayStateUpdate(pts, retention = "36500 days")
        .writeStream.format("memory").queryName(qname)
        .outputMode("update").start()
      val urls = Pages.pages(s, dir).select("url").collect()
        .map(_.getString(0))
      val (first, second) = urls.splitAt(urls.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      drainMemorySink(s, q, qname)
        .groupBy("ix", "iy")
        .agg(max("n_pages").as("n_pages"), max("w_sum").as("w_sum"))
        .orderBy("ix", "iy")
    })
  )

  def oracles: Map[String, String] = Map(

    "q137_imageio_meta" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(n_chars % 64 + 1 AS INT) AS w,
        |    CAST(doc_id % 48 + 1 AS INT) AS h
        |  FROM documents),
        |px AS (SELECT doc_id, w, h,
        |    unnest(generate_series(0, w * h - 1)) AS i
        |  FROM dims WHERE doc_id % 2 = 0),
        |sums AS (SELECT doc_id,
        |    CAST(sum((doc_id * 31 + 7 * (i % w) + 13 * (i // w)) % 256)
        |         AS BIGINT) AS red_sum
        |  FROM px GROUP BY doc_id)
        |SELECT d.doc_id AS id,
        |  CASE WHEN d.doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
        |  CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
        |  CAST(coalesce(s.red_sum, -1) AS BIGINT) AS red_sum
        |FROM dims d LEFT JOIN sums s ON d.doc_id = s.doc_id
        |ORDER BY id""".stripMargin,

    // same oracle as q132: the update-mode state must reconstruct to the
    // identical batch aggregation
    "q138_cdx_update_stream" ->
      """WITH c AS (SELECT doc_id, text,
        |    unnest(range(doc_id % 3 + 1)) AS j FROM documents),
        |r AS (SELECT
        |    'https://host' || CAST(doc_id % 97 AS VARCHAR) || '.example.org/doc/'
        |      || CAST(doc_id AS VARCHAR) AS url,
        |    CAST(1600000000 + doc_id * 137 + j * 86400 AS BIGINT) AS ts,
        |    md5(CASE WHEN j = 2 THEN 'MOD ' || text ELSE text END) AS digest
        |  FROM c)
        |SELECT url, digest, min(ts) AS first_ts, count(*) AS n_caps
        |FROM r GROUP BY 1, 2 ORDER BY url, digest""".stripMargin,

    // same oracle as q122: update-mode decay state vs the batch density
    "q139_decay_update_stream" ->
      s"""WITH pg AS (${Pages.geotaggedSql}),
         |t AS (SELECT CAST(floor(x / 512) AS BIGINT) AS ix,
         |             CAST(floor(y / 512) AS BIGINT) AS iy,
         |        (1610000000 - CAST(epoch(warc_ts) AS BIGINT)) // 86400
         |          AS age
         |      FROM pg)
         |SELECT ix, iy, count(*) AS n_pages,
         |  CAST(sum(CASE WHEN age < 0 THEN 1000000
         |       WHEN (age // 16) > 62 THEN 0
         |       ELSE 1000000 >> CAST(age // 16 AS INT) END) AS BIGINT)
         |    AS w_sum
         |FROM t GROUP BY 1, 2 ORDER BY ix, iy""".stripMargin
  )
}
