package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 fifty-second batch: streaming conversion funnel through
  * flatMapGroupsWithState (update mode, two-long state per active user,
  * event-time timeout), exact Pearson correlation components between
  * document features, and link-graph edge churn between crawl halves. */
object EntryRound5az {

  private val streamSeq = new java.util.concurrent.atomic.AtomicLong(0)

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

    // UPDATE-MODE streaming funnel: per-user earliest signup + first
    // purchase within 2h, state two longs per ACTIVE user with
    // event-time eviction; the feed arrives time-ordered in two
    // micro-batches and the final table is the monotone min-
    // reconstruction over updates, gated by the batch SQL
    "q294_funnel_stream" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val mem = MemoryStream[(Long, String, Long)](s)
      val qname = s"q294_funnel_${streamSeq.incrementAndGet()}"
      val q = graft.streaming.StatefulCrawl.funnelStateUpdate(
          mem.toDF().toDF("user_id", "event_type", "tus"),
          windowUs = 7200L * 1000000L, retention = "3650 days")
        .writeStream.format("memory").queryName(qname)
        .outputMode("update").start()
      val rows = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tus"))
        .orderBy("tus", "user_id", "event_type")
        .as[(Long, String, Long)].collect()
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      drainMemorySink(s, q, qname)
        .groupBy("user_id")
        .agg(min("signup_us").as("signup_us"),
          coalesce(min(when(col("purchase_us") >= 0,
            col("purchase_us"))), lit(-1L)).as("purchase_us"))
    }),

    // feature dependence: exact Pearson components between n_chars,
    // token count, and distinct-token count — num = N·Σxy − Σx·Σy and
    // the two variance terms, all integers (the ratio/√ stays with the
    // analyst; the engine's job is the exact sums)
    "q295_pearson_components" -> ((s, dir) => {
      val f = s.read.parquet(s"$dir/documents.parquet")
        .select(col("n_chars").as("f1"),
          size(split(col("text"), " ")).cast("long").as("f2"),
          size(array_distinct(split(col("text"), " "))).cast("long")
            .as("f3"))
      val stats = f.agg(
        count(lit(1)).as("n"),
        sum("f1").as("s1"), sum("f2").as("s2"), sum("f3").as("s3"),
        sum(expr("f1 * f1")).as("s11"), sum(expr("f2 * f2")).as("s22"),
        sum(expr("f3 * f3")).as("s33"),
        sum(expr("f1 * f2")).as("s12"), sum(expr("f1 * f3")).as("s13"),
        sum(expr("f2 * f3")).as("s23"))
      stats.select(
        expr("stack(3, " +
          "'chars_tokens', n*s12 - s1*s2, n*s11 - s1*s1, n*s22 - s2*s2, " +
          "'chars_distinct', n*s13 - s1*s3, n*s11 - s1*s1, n*s33 - s3*s3, " +
          "'tokens_distinct', n*s23 - s2*s3, n*s22 - s2*s2, n*s33 - s3*s3)" +
          " AS (pair, cov_num, var_a, var_b)"))
    }),

    // edge churn: the link graph built from the first half of the corpus
    // vs the second — carried / dropped / new edge counts, the crawl-to-
    // crawl structural-drift report; two DISTINCT edge sets, one full
    // outer join on the edge key
    "q296_edge_churn" -> ((s, dir) => {
      def half(lo: Boolean) = s.read.parquet(s"$dir/documents.parquet")
        .where(if (lo) col("doc_id") % 2 === 0 else col("doc_id") % 2 === 1)
        .select((col("doc_id") % 97).as("src"),
          expr("(doc_id * 31 + 7) % 97").as("dst"))
        .where(col("src") =!= col("dst")).distinct()
      val a = half(true).withColumn("in_a", lit(1))
      val b = half(false).withColumn("in_b", lit(1))
      a.join(b, Seq("src", "dst"), "full")
        .agg(
          sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L)
            .otherwise(0L)).as("carried"),
          sum(when(col("in_a").isNotNull && col("in_b").isNull, 1L)
            .otherwise(0L)).as("dropped"),
          sum(when(col("in_a").isNull && col("in_b").isNotNull, 1L)
            .otherwise(0L)).as("added"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q294_funnel_stream" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus
        |  FROM events),
        |su AS (SELECT user_id, min(tus) AS s FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (SELECT e.user_id, min(tus) AS p
        |  FROM e JOIN su ON su.user_id = e.user_id
        |  WHERE event_type = 'purchase' AND tus >= s
        |    AND tus <= s + 7200000000 GROUP BY 1)
        |SELECT su.user_id, CAST(s AS BIGINT) AS signup_us,
        |  CAST(coalesce(p, -1) AS BIGINT) AS purchase_us
        |FROM su LEFT JOIN pu ON pu.user_id = su.user_id""".stripMargin,

    "q295_pearson_components" ->
      """WITH f AS (SELECT n_chars AS f1,
        |    len(string_split(text, ' ')) AS f2,
        |    len(list_distinct(string_split(text, ' '))) AS f3
        |  FROM documents),
        |s AS (SELECT count(*) AS n, sum(f1) AS s1, sum(f2) AS s2,
        |    sum(f3) AS s3, sum(f1*f1) AS s11, sum(f2*f2) AS s22,
        |    sum(f3*f3) AS s33, sum(f1*f2) AS s12, sum(f1*f3) AS s13,
        |    sum(f2*f3) AS s23
        |  FROM f)
        |SELECT 'chars_tokens' AS pair,
        |  CAST(n*s12 - s1*s2 AS BIGINT) AS cov_num,
        |  CAST(n*s11 - s1*s1 AS BIGINT) AS var_a,
        |  CAST(n*s22 - s2*s2 AS BIGINT) AS var_b FROM s
        |UNION ALL
        |SELECT 'chars_distinct', CAST(n*s13 - s1*s3 AS BIGINT),
        |  CAST(n*s11 - s1*s1 AS BIGINT), CAST(n*s33 - s3*s3 AS BIGINT)
        |FROM s
        |UNION ALL
        |SELECT 'tokens_distinct', CAST(n*s23 - s2*s3 AS BIGINT),
        |  CAST(n*s22 - s2*s2 AS BIGINT), CAST(n*s33 - s3*s3 AS BIGINT)
        |FROM s""".stripMargin,

    "q296_edge_churn" ->
      """WITH a AS (SELECT DISTINCT doc_id % 97 AS src,
        |    (doc_id * 31 + 7) % 97 AS dst
        |  FROM documents WHERE doc_id % 2 = 0
        |    AND doc_id % 97 <> (doc_id * 31 + 7) % 97),
        |b AS (SELECT DISTINCT doc_id % 97 AS src,
        |    (doc_id * 31 + 7) % 97 AS dst
        |  FROM documents WHERE doc_id % 2 = 1
        |    AND doc_id % 97 <> (doc_id * 31 + 7) % 97)
        |SELECT
        |  CAST((SELECT count(*) FROM a JOIN b USING (src, dst)) AS BIGINT)
        |    AS carried,
        |  CAST((SELECT count(*) FROM a ANTI JOIN b USING (src, dst))
        |    AS BIGINT) AS dropped,
        |  CAST((SELECT count(*) FROM b ANTI JOIN a USING (src, dst))
        |    AS BIGINT) AS added""".stripMargin
  )
}
