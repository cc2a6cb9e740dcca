package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 fifty-third batch: next-token continuation table (per-context
  * top-3 from bigram counts, salted two-phase rank), rolling 7-day active
  * users (exact WAU/DAU from day-bucketed distinct sets), and streaming
  * dedupe within watermark via Spark's BUILT-IN
  * dropDuplicatesWithinWatermark (the use-the-platform twin of the
  * custom state ops). */
object EntryRound5ba {

  private val streamSeq = new java.util.concurrent.atomic.AtomicLong(0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // autocomplete table: for each context token with ≥ 30 continuations,
    // the top-3 next tokens by count — context is a mega-group at crawl
    // scale, so ranking is the salted two-phase top-k (per-salt prefilter
    // before the per-context window)
    "q297_next_token_topk" -> ((s, dir) => {
      val tok = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val bg = tok.alias("a").join(tok.alias("b"),
          expr("a.doc_id = b.doc_id AND b.pos = a.pos + 1"))
        .select(col("a.w").as("ctx"), col("b.w").as("nxt"))
        .groupBy("ctx", "nxt").agg(count(lit(1)).as("n"))
      val tot = bg.groupBy("ctx").agg(sum("n").as("ctx_n"))
        .where(col("ctx_n") >= 30)
      val order = Seq(col("n").desc, col("nxt").asc)
      bg.join(tot, "ctx")
        .withColumn("__salt", pmod(hash(col("nxt")), lit(8)))
        .withColumn("__pr", row_number().over(
          Window.partitionBy("ctx", "__salt").orderBy(order: _*)))
        .where(col("__pr") <= 3)
        .withColumn("rank", row_number().over(
          Window.partitionBy("ctx").orderBy(order: _*)).cast("int"))
        .where(col("rank") <= 3)
        .select(col("ctx"), col("nxt"), col("n"), col("rank"))
    }),

    // WAU/DAU: per day, distinct actives that day and over the trailing
    // 7 days — (user, day) distinct pairs range-joined to the day axis
    // (≤ 7 days per row), then one distinct count per day; stickiness in
    // exact micro-units
    "q298_wau_dau" -> ((s, dir) => {
      val ud = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
            .as("day"))
        .distinct()
        .transform(graft.spark.PersistTracker.persist)
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val days = ud.select("day").distinct()
      val wau = days.toDF("d")
        .join(ud, col("day") <= col("d") && col("day") > col("d") - 7)
        .groupBy("d").agg(countDistinct("user_id").as("wau"))
      dau.join(wau, col("day") === col("d"))
        .select(col("day"), col("dau"), col("wau"),
          expr("(1000000 * dau) div wau").as("stickiness_e6"))
    }),

    // the platform's own streaming dedupe: duplicate capture events
    // (url, digest) arriving across two micro-batches collapse via
    // dropDuplicatesWithinWatermark — state is bounded by the watermark,
    // no custom state code; gated by the batch DISTINCT
    "q299_stream_dedupe" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val mem = MemoryStream[(String, Long, String)](s)
      val qname = s"q299_dedupe_${streamSeq.incrementAndGet()}"
      val deduped = mem.toDF().toDF("url", "ts", "digest")
        .withColumn("ets", timestamp_seconds(col("ts")))
        .withWatermark("ets", "3650 days")
        .dropDuplicatesWithinWatermark("url", "digest")
      val q = deduped.writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      // the q105 capture feed: revisits carry the SAME digest → dupes
      val rows = EntryRound4c.captures(s, dir)
        .select(col("url"), col("ts"), md5(col("text")).as("digest"))
        .as[(String, Long, String)].collect()
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val out = s.createDataFrame(
        java.util.Arrays.asList(s.table(qname).collect(): _*),
        s.table(qname).schema)
      q.stop()
      out.groupBy("url", "digest").agg(count(lit(1)).as("n_emitted"))
        .groupBy()
        .agg(count(lit(1)).as("n_distinct_pairs"),
          sum("n_emitted").as("n_emitted_total"),
          max("n_emitted").as("max_per_pair"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q297_next_token_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS w
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l
        |        FROM documents)),
        |bg AS (SELECT a.w AS ctx, b.w AS nxt, count(*) AS n
        |  FROM tok a JOIN tok b
        |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  GROUP BY 1, 2),
        |tot AS (SELECT ctx, sum(n) AS ctx_n FROM bg GROUP BY ctx
        |        HAVING sum(n) >= 30),
        |r AS (SELECT bg.ctx, nxt, n,
        |    row_number() OVER (PARTITION BY bg.ctx
        |      ORDER BY n DESC, nxt) AS rank
        |  FROM bg JOIN tot ON tot.ctx = bg.ctx)
        |SELECT ctx, nxt, CAST(n AS BIGINT) AS n, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 3""".stripMargin,

    "q298_wau_dau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
        |days AS (SELECT DISTINCT day AS d FROM ud),
        |wau AS (SELECT d, count(DISTINCT user_id) AS wau
        |  FROM days JOIN ud ON ud.day <= days.d AND ud.day > days.d - 7
        |  GROUP BY d)
        |SELECT CAST(dau.day AS BIGINT) AS day,
        |  CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
        |  CAST((1000000 * dau) // wau AS BIGINT) AS stickiness_e6
        |FROM dau JOIN wau ON wau.d = dau.day""".stripMargin,

    "q299_stream_dedupe" ->
      """WITH cap AS (SELECT
        |    concat('https://host', CAST(doc_id % 97 AS VARCHAR),
        |      '.example.org/doc/', CAST(doc_id AS VARCHAR)) AS url,
        |    md5(CASE WHEN j = 2 THEN 'MOD ' || text ELSE text END)
        |      AS digest
        |  FROM (SELECT doc_id, text, unnest(range(doc_id % 3 + 1)) AS j
        |        FROM documents)),
        |d AS (SELECT DISTINCT url, digest FROM cap)
        |SELECT CAST(count(*) AS BIGINT) AS n_distinct_pairs,
        |  CAST(count(*) AS BIGINT) AS n_emitted_total,
        |  CAST(1 AS BIGINT) AS max_per_pair
        |FROM d""".stripMargin
  )
}
