package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 fifty-sixth batch: Q–Q decile table between two language
  * length distributions (exact rank selection), a freshness-SLA report
  * (stale-page share per host against a capture-age threshold), and
  * inter-arrival moment components per event type (the burstiness
  * inputs, exact integers). */
object EntryRound5be {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q–Q: decile values of n_chars for the two largest languages, the
    // distribution-shift picture behind a KS number; rank selection at
    // ceil(n·d/10) with the exactPercentiles arithmetic, per-lang windows
    "q307_qq_deciles" -> ((s, dir) => {
      val base = s.read.parquet(s"$dir/documents.parquet")
        .where(col("lang").isin("en", "de"))
        .select(col("lang"), col("n_chars").cast("long").as("v"),
          col("doc_id"))
      val w = Window.partitionBy("lang").orderBy(col("v"), col("doc_id"))
      val ranked = base
        .withColumn("r", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      val decs = ranked
        .crossJoin(broadcast(
          s.range(1, 10).select(col("id").as("dec"))))
        .where(col("r") === expr("(n * dec + 9) div 10"))
        .groupBy("dec")
        .agg(max(when(col("lang") === "en", col("v"))).as("en_v"),
          max(when(col("lang") === "de", col("v"))).as("de_v"))
      decs.select(col("dec").cast("int").as("decile"), col("en_v"),
        col("de_v"))
    }),

    // freshness SLA: pages whose capture age exceeds 180 days, per host —
    // the recrawl-debt report; warc_ts is the derivable capture time,
    // "now" is a fixed audit instant so the report is reproducible
    "q308_freshness_sla" -> ((s, dir) => {
      val pg = fixtures.Pages.pages(s, dir)
        .select(regexp_extract(col("url"), "host(\\d+)", 1)
          .cast("long").as("host"),
          unix_timestamp(col("warc_ts")).as("cap_ts"))
      pg.withColumn("stale",
          (lit(1610000000L) - col("cap_ts") > 180L * 86400L).cast("long"))
        .groupBy("host")
        .agg(count(lit(1)).as("n_pages"), sum("stale").as("n_stale"))
        .withColumn("stale_e6", expr("(1000000 * n_stale) div n_pages"))
    }),

    // burstiness inputs: per event type the exact moment components of
    // inter-arrival gaps (n, Σg, Σg²) — the analyst computes
    // B = (σ−μ)/(σ+μ) from these; one lag window per type, exact longs
    "q309_interarrival_moments" -> ((s, dir) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("tus"), col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_type"), col("event_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tus"))
        // second-granularity gaps: µs² would overflow a long
        .withColumn("gap",
          (col("tus") - lag("tus", 1).over(w)))
        .withColumn("gap", expr("gap div 1000000"))
        .where(col("gap").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          sum("gap").as("sum_gap"),
          sum(expr("gap * gap")).as("sum_gap_sq"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q307_qq_deciles" ->
      """WITH base AS (SELECT lang, n_chars AS v, doc_id FROM documents
        |  WHERE lang IN ('en', 'de')),
        |r AS (SELECT lang, v,
        |    row_number() OVER (PARTITION BY lang ORDER BY v, doc_id)
        |      AS r,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM base),
        |d AS (SELECT r.lang, r.v, dec FROM r,
        |    (SELECT unnest(range(1, 10)) AS dec) t
        |  WHERE r.r = (n * dec + 9) // 10)
        |SELECT CAST(dec AS INT) AS decile,
        |  CAST(max(CASE WHEN lang = 'en' THEN v END) AS BIGINT) AS en_v,
        |  CAST(max(CASE WHEN lang = 'de' THEN v END) AS BIGINT) AS de_v
        |FROM d GROUP BY dec""".stripMargin,

    "q308_freshness_sla" ->
      """WITH pg AS (SELECT doc_id % 97 AS host,
        |    1600000000 + doc_id * 137 AS cap_ts
        |  FROM documents)
        |SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
        |  CAST(sum(CASE WHEN 1610000000 - cap_ts > 180 * 86400
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
        |  CAST((1000000 * sum(CASE WHEN 1610000000 - cap_ts > 180 * 86400
        |      THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS stale_e6
        |FROM pg GROUP BY host""".stripMargin,

    "q309_interarrival_moments" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS tus
        |  FROM events),
        |g AS (SELECT event_type,
        |    (tus - lag(tus) OVER (PARTITION BY event_type
        |      ORDER BY tus, event_id)) // 1000000 AS gap
        |  FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(sum(gap) AS BIGINT) AS sum_gap,
        |  CAST(sum(gap * gap) AS BIGINT) AS sum_gap_sq
        |FROM g WHERE gap IS NOT NULL GROUP BY event_type""".stripMargin
  )
}
