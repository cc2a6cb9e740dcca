package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 forty-sixth batch: Borda-count rank aggregation across
  * independent host-importance signals, capture–recapture estimation of
  * the unseen-URL population (Lincoln–Petersen / Chapman), and weighted
  * (multiset) Jaccard similarity between host term profiles. */
object EntryRound5at {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // rank aggregation: three deterministic host signals (page volume,
    // link in-degree, distinct-term activity) → per-signal dense ranks →
    // Borda score = rank sum → final rank; all keyed aggregates + the
    // tiny 97-row rank windows
    "q276_borda_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val vol = docs.groupBy((col("doc_id") % 97).as("host"))
        .agg(count(lit(1)).as("v"))
      val indeg = docs.select(expr("(doc_id * 31 + 7) % 97").as("host"))
        .groupBy("host").agg(count(lit(1)).as("v"))
      val terms = docs.select((col("doc_id") % 97).as("host"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy("host").agg(countDistinct("w").as("v"))
      def rank(df: DataFrame) = df.withColumn("r",
        row_number().over(Window.orderBy(col("v").desc, col("host"))))
        .select(col("host"), col("r"))
      val borda = rank(vol).withColumnRenamed("r", "r1")
        .join(rank(indeg).withColumnRenamed("r", "r2"), "host")
        .join(rank(terms).withColumnRenamed("r", "r3"), "host")
        .withColumn("borda", col("r1") + col("r2") + col("r3"))
      borda.withColumn("final_rank", row_number()
          .over(org.apache.spark.sql.expressions.Window
            .orderBy(col("borda"), col("host"))).cast("int"))
        .select(col("host"), col("r1").cast("int").as("r1"),
          col("r2").cast("int").as("r2"), col("r3").cast("int").as("r3"),
          col("borda").cast("long").as("borda"), col("final_rank"))
    }),

    // how many URLs exist that neither crawl saw: two deterministic
    // samples (hash gates), overlap m → Lincoln–Petersen N = n1·n2/m and
    // the bias-corrected Chapman form, exact integer division — the
    // crawl-coverage estimate next to the true count for calibration
    "q277_capture_recapture" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          ((col("doc_id") * 2654435761L) % 100L < 40L).as("s1"),
          ((col("doc_id") * 16807L + 13L) % 100L < 35L).as("s2"))
      docs.agg(
        count(lit(1)).as("n_true"),
        sum(col("s1").cast("long")).as("n1"),
        sum(col("s2").cast("long")).as("n2"),
        sum((col("s1") && col("s2")).cast("long")).as("m"))
        .withColumn("lincoln_petersen", expr("(n1 * n2) div m"))
        .withColumn("chapman",
          expr("((n1 + 1) * (n2 + 1)) div (m + 1) - 1"))
    }),

    // weighted Jaccard between host term-frequency profiles:
    // J_w = Σ min(fa, fb) / Σ max(fa, fb) over the union vocabulary —
    // the multiset form plain shingle Jaccard under-weights; host pairs
    // bounded to a 7-host panel, the term join is keyed by word
    "q278_weighted_jaccard" -> ((s, dir) => {
      val prof = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 97 < 7)
        .select((col("doc_id") % 97).as("host"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy("host", "w").agg(count(lit(1)).as("f"))
      // union-vocabulary identity: Σmax = tot_a + tot_b − Σmin, so only
      // the SHARED terms ever join (missing terms contribute min = 0)
      val tot = prof.groupBy("host").agg(sum("f").as("tot"))
      val a = prof.toDF("ha", "w", "fa")
      val b = prof.toDF("hb", "w", "fb")
      a.join(b, "w")
        .where(col("ha") < col("hb"))
        .groupBy("ha", "hb")
        .agg(sum(least(col("fa"), col("fb"))).as("s_min"))
        .join(broadcast(tot.toDF("ha", "tot_a")), "ha")
        .join(broadcast(tot.toDF("hb", "tot_b")), "hb")
        .withColumn("s_max", expr("tot_a + tot_b - s_min"))
        .withColumn("jw_e6", expr("(1000000 * s_min) div s_max"))
        .select("ha", "hb", "s_min", "s_max", "jw_e6")
    })
  )

  def oracles: Map[String, String] = Map(

    "q276_borda_rank" ->
      """WITH vol AS (SELECT doc_id % 97 AS host, count(*) AS v
        |  FROM documents GROUP BY 1),
        |ind AS (SELECT (doc_id * 31 + 7) % 97 AS host, count(*) AS v
        |  FROM documents GROUP BY 1),
        |trm AS (SELECT host, count(DISTINCT w) AS v FROM (
        |    SELECT doc_id % 97 AS host,
        |      unnest(string_split(text, ' ')) AS w
        |    FROM documents) GROUP BY host),
        |r1 AS (SELECT host, row_number() OVER (ORDER BY v DESC, host)
        |         AS r FROM vol),
        |r2 AS (SELECT host, row_number() OVER (ORDER BY v DESC, host)
        |         AS r FROM ind),
        |r3 AS (SELECT host, row_number() OVER (ORDER BY v DESC, host)
        |         AS r FROM trm),
        |j AS (SELECT r1.host, r1.r AS r1, r2.r AS r2, r3.r AS r3,
        |        r1.r + r2.r + r3.r AS borda
        |      FROM r1 JOIN r2 ON r2.host = r1.host
        |              JOIN r3 ON r3.host = r1.host)
        |SELECT host, CAST(r1 AS INT) AS r1, CAST(r2 AS INT) AS r2,
        |  CAST(r3 AS INT) AS r3, CAST(borda AS BIGINT) AS borda,
        |  CAST(row_number() OVER (ORDER BY borda, host) AS INT)
        |    AS final_rank
        |FROM j""".stripMargin,

    "q277_capture_recapture" ->
      """WITH d AS (SELECT doc_id,
        |    (doc_id * 2654435761) % 100 < 40 AS s1,
        |    (doc_id * 16807 + 13) % 100 < 35 AS s2
        |  FROM documents),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_true,
        |    CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS m
        |  FROM d)
        |SELECT n_true, n1, n2, m,
        |  CAST((n1 * n2) // m AS BIGINT) AS lincoln_petersen,
        |  CAST(((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS BIGINT) AS chapman
        |FROM a""".stripMargin,

    "q278_weighted_jaccard" ->
      """WITH prof AS (SELECT host, w, count(*) AS f FROM (
        |    SELECT doc_id % 97 AS host,
        |      unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE doc_id % 97 < 7) GROUP BY host, w),
        |tot AS (SELECT host, sum(f) AS tot FROM prof GROUP BY host),
        |p0 AS (SELECT a.host AS ha, b.host AS hb,
        |    sum(least(a.f, b.f)) AS s_min
        |  FROM prof a JOIN prof b ON b.w = a.w AND a.host < b.host
        |  GROUP BY 1, 2),
        |p AS (SELECT p0.ha, p0.hb, p0.s_min,
        |    ta.tot + tb.tot - p0.s_min AS s_max
        |  FROM p0 JOIN tot ta ON ta.host = p0.ha
        |          JOIN tot tb ON tb.host = p0.hb)
        |SELECT ha, hb, CAST(s_min AS BIGINT) AS s_min,
        |  CAST(s_max AS BIGINT) AS s_max,
        |  CAST((1000000 * s_min) // s_max AS BIGINT) AS jw_e6
        |FROM p""".stripMargin
  )
}
