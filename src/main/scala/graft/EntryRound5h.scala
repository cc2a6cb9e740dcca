package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Round-5 eighth batch: normalization-canonical dedup and a stream-static
  * join twin — each with a closed-form DuckDB oracle. */
object EntryRound5h {

  private[graft] val streamSeq = new AtomicLong(0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C4-style normalized dedup: documents plus case/punctuation-mangled
    // copies (UPPERCASE + '!!', id+100000) collapse to the same normalized
    // hash; only hashes and ids shuffle
    "q168_normalized_dedup" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val corpus = d.select(col("doc_id"), col("text"))
        .unionByName(d.where(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"),
            concat(upper(col("text")), lit("!!")).as("text")))
      graft.text.NormalizeDedup.dupGroups(corpus, "doc_id", "text")
        .orderBy("rep_id")
    }),

    // stream-static join: the capture stream (MemoryStream, two batches)
    // enriched against a STATIC per-domain robots decision dimension
    // (broadcast — the Structured Streaming stream-static equi-join), then
    // a complete-mode per-domain allowed/blocked rollup; the oracle is the
    // batch equivalent of the whole chain
    "q169_stream_static_robots" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val robots = s.range(0, 97)
        .select(concat(lit("host"), col("id")).as("domain"),
          (col("id") % 3 =!= 0).cast("int").as("allowed"))
      val mem = MemoryStream[Long](s)
      val qname = s"q169_ss_${streamSeq.incrementAndGet()}"
      val q = mem.toDF().toDF("doc_id")
        .select(concat(lit("host"), col("doc_id") % 97).as("domain"))
        .join(robots, "domain") // stream-static equi-join
        .groupBy("domain")
        .agg(count(lit(1)).as("n_fetches"),
          sum(col("allowed").cast("long")).as("n_allowed"))
        .writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
      val ids = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").as[Long].collect()
      val (first, second) = ids.splitAt(ids.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val out = s.createDataFrame(
        java.util.Arrays.asList(s.table(qname).collect(): _*),
        s.table(qname).schema)
      q.stop()
      out.orderBy("domain")
    })
  )

  def oracles: Map[String, String] = Map(

    "q168_normalized_dedup" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, upper(text) || '!!'
        |  FROM documents WHERE doc_id % 3 = 0),
        |n AS (SELECT doc_id, md5(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g'))) AS nh
        |  FROM corpus),
        |g AS (SELECT nh, min(doc_id) AS rep_id,
        |        CAST(count(*) AS BIGINT) AS n_members
        |      FROM n GROUP BY nh)
        |SELECT nh, rep_id, n_members FROM g WHERE n_members > 1
        |ORDER BY rep_id""".stripMargin,

    "q169_stream_static_robots" ->
      """WITH f AS (SELECT 'host' || CAST(doc_id % 97 AS STRING) AS domain,
        |    CAST(CASE WHEN (doc_id % 97) % 3 <> 0 THEN 1 ELSE 0 END
        |      AS BIGINT) AS allowed
        |  FROM documents)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_fetches,
        |  CAST(sum(allowed) AS BIGINT) AS n_allowed
        |FROM f GROUP BY domain ORDER BY domain""".stripMargin
  )
}
