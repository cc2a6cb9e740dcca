package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 twenty-fifth batch: the three bread-and-butter event-analytics
  * operators over the events stream table — ordered funnel conversion,
  * retention cohorts, and the event-type transition matrix — each gated
  * by a closed-form DuckDB oracle. */
object EntryRound5y {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ordered funnel view → click → purchase: a user converts iff the
    // three steps happen in event-time order (min-ts per step, strict
    // ordering) — three tiny per-user aggregates, no self-join
    "q216_funnel" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts").cast("timestamp")).as("es"))
      val steps = ev
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("es"))).as("t1"),
          min(when(col("event_type") === "click", col("es"))).as("t2"),
          min(when(col("event_type") === "purchase", col("es"))).as("t3"))
      // NOTE: t2 is the first click AFTER nothing — the standard lenient
      // funnel uses first-ever steps with ordering; strict re-anchored
      // funnels differ and are documented out of scope here
      steps.agg(
          count(lit(1)).as("n_users"),
          sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("step1"),
          sum(when(col("t1").isNotNull && col("t2") > col("t1"), 1L)
            .otherwise(0L)).as("step2"),
          sum(when(col("t1").isNotNull && col("t2") > col("t1") &&
            col("t3") > col("t2"), 1L).otherwise(0L)).as("step3"))
    }),

    // retention cohorts: users grouped by first-activity day, counted by
    // how many distinct later WEEKS they return — the (cohort_day,
    // week_offset, n_users) triangle every growth dashboard draws
    "q217_retention_cohorts" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"),
          expr("unix_timestamp(cast(ts as timestamp)) div 86400").as("day"))
      val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      ev.join(first, "user_id")
        .select(col("user_id"), col("cohort_day"),
          expr("(day - cohort_day) div 7").as("week_off"))
        .distinct()
        .groupBy("cohort_day", "week_off")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "week_off")
    }),

    // event-type transition matrix: consecutive events per user →
    // (from, to) counts and integer permille per from-state — the
    // Markov-chain view of user behavior (per-user lag window only)
    "q218_transition_matrix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_timestamp(col("ts").cast("timestamp")).as("es"))
      val w = Window.partitionBy("user_id").orderBy(col("es"), col("event_id"))
      val wf = Window.partitionBy("from_type")
      ev.withColumn("from_type", lag("event_type", 1).over(w))
        .where(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum("n").over(wf))
        .withColumn("permille", expr("n * 1000 div tot"))
        .drop("tot")
        .orderBy("from_type", "to_type")
    })
  )

  def oracles: Map[String, String] = Map(

    "q216_funnel" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    epoch_us(ts) // 1000000 AS es FROM events),
        |st AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN es END) AS t1,
        |    min(CASE WHEN event_type = 'click' THEN es END) AS t2,
        |    min(CASE WHEN event_type = 'purchase' THEN es END) AS t3
        |  FROM ev GROUP BY 1)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS step1,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 > t1
        |    THEN 1 ELSE 0 END) AS BIGINT) AS step2,
        |  CAST(sum(CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS step3
        |FROM st""".stripMargin,

    "q217_retention_cohorts" ->
      """WITH ev AS (SELECT user_id,
        |    epoch_us(ts) // 1000000 // 86400 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
        |w AS (SELECT DISTINCT ev.user_id, cohort_day,
        |        (day - cohort_day) // 7 AS week_off
        |      FROM ev JOIN f USING (user_id))
        |SELECT cohort_day, week_off, count(*) AS n_users
        |FROM w GROUP BY 1, 2 ORDER BY cohort_day, week_off""".stripMargin,

    "q218_transition_matrix" ->
      """WITH ev AS (SELECT user_id, event_type, event_id,
        |    epoch_us(ts) // 1000000 AS es FROM events),
        |h AS (SELECT event_type AS to_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |          ORDER BY es, event_id) AS from_type
        |      FROM ev),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM h
        |      WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n * 1000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT)
        |    AS permille
        |FROM c ORDER BY from_type, to_type""".stripMargin
  )
}
