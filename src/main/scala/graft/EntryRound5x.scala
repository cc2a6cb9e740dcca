package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 twenty-fourth batch: quadkey tile naming with prefix
  * containment, the late-data watermark profile, and the user
  * origin-destination flow matrix — each gated by a closed-form DuckDB
  * oracle. */
object EntryRound5x {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bing-style quadkeys: the level-4 tile name of every page point as
    // a base-4 string (one digit per zoom level, MSB first — pure
    // codegen transform/array_join), plus the count under a level-2
    // prefix via startsWith — string-prefix containment IS ancestor
    // containment for quadkeys, which is what makes them range-prunable
    "q213_quadkey_tiles" -> ((s, dir) => {
      val pts = graft.fixtures.TpchGeo.points(s, dir)
      val qk = pts
        .withColumn("tx", floor(col("x") / 512.0).cast("long"))
        .withColumn("ty", floor(col("y") / 512.0).cast("long"))
        .withColumn("qk", expr(
          """array_join(transform(sequence(3, 0, -1), l ->
            |  CAST((CASE WHEN (tx div CAST(pow(2, l) AS LONG)) % 2 = 1 THEN 1 ELSE 0 END) +
            |       (CASE WHEN (ty div CAST(pow(2, l) AS LONG)) % 2 = 1 THEN 2 ELSE 0 END)
            |    AS STRING)), '')""".stripMargin))
      // prefix containment: a level-4 tile lies under the level-2 tile
      // '03' iff its quadkey string starts with "03"
      qk.groupBy("qk").agg(count(lit(1)).as("n"))
        .withColumn("under_03", col("qk").startsWith("03"))
        .orderBy("qk")
    }),

    // late-data profile: per event-time day, how many events arrived
    // past a 2-hour watermark (arrival = event time + a deterministic
    // per-event skew) — the report that sizes a streaming watermark
    "q214_late_data_profile" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"),
          unix_timestamp(col("ts").cast("timestamp")).as("es"))
        .withColumn("skew", expr("(event_id * 7919) % 14400")) // 0..4h
        .withColumn("day", expr("es div 86400"))
      ev.groupBy("day")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("skew") > 7200, 1L).otherwise(0L)).as("n_late"))
        .withColumn("late_permille", expr("n_late * 1000 div n_events"))
        .orderBy("day")
    }),

    // origin-destination flow matrix: consecutive events per user hop
    // between grid cells — lag window PER USER (bounded groups), then a
    // keyed flow count; self-flows excluded. The trajectory face of the
    // spatial layer.
    "q215_od_flows" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts").cast("timestamp")).as("es"))
        .withColumn("cx", expr("(event_id * 48271) % 8000 div 1000"))
        .withColumn("cy", expr("(event_id * 16807) % 8000 div 1000"))
      val w = Window.partitionBy("user_id").orderBy(col("es"), col("event_id"))
      ev.withColumn("pcx", lag("cx", 1).over(w))
        .withColumn("pcy", lag("cy", 1).over(w))
        .where(col("pcx").isNotNull &&
          (col("pcx") =!= col("cx") || col("pcy") =!= col("cy")))
        .groupBy(col("pcx").as("from_cx"), col("pcy").as("from_cy"),
          col("cx").as("to_cx"), col("cy").as("to_cy"))
        .agg(count(lit(1)).as("n_trips"))
        .where(col("n_trips") >= 3)
        .orderBy("from_cx", "from_cy", "to_cx", "to_cy")
    })
  )

  def oracles: Map[String, String] = Map(

    "q213_quadkey_tiles" -> {
      val pointsSql = graft.fixtures.TpchGeo.pointsSql
      s"""WITH pts AS ($pointsSql),
         |t AS (SELECT CAST(floor(x/512.0) AS BIGINT) AS tx,
         |        CAST(floor(y/512.0) AS BIGINT) AS ty FROM pts),
         |k AS (SELECT
         |  CAST((tx // 8) % 2 + 2 * ((ty // 8) % 2) AS VARCHAR) ||
         |  CAST((tx // 4) % 2 + 2 * ((ty // 4) % 2) AS VARCHAR) ||
         |  CAST((tx // 2) % 2 + 2 * ((ty // 2) % 2) AS VARCHAR) ||
         |  CAST(tx % 2 + 2 * (ty % 2) AS VARCHAR) AS qk FROM t)
         |SELECT qk, count(*) AS n, qk LIKE '03%' AS under_03
         |FROM k GROUP BY 1 ORDER BY qk""".stripMargin
    },

    "q214_late_data_profile" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) // 1000000 AS es
        |  FROM events),
        |k AS (SELECT es // 86400 AS day,
        |        (event_id * 7919) % 14400 AS skew FROM ev)
        |SELECT day, count(*) AS n_events,
        |  CAST(sum(CASE WHEN skew > 7200 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late,
        |  CAST(sum(CASE WHEN skew > 7200 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000 // count(*) AS late_permille
        |FROM k GROUP BY 1 ORDER BY day""".stripMargin,

    "q215_od_flows" ->
      """WITH ev AS (SELECT event_id, user_id,
        |    epoch_us(ts) // 1000000 AS es,
        |    (event_id * 48271) % 8000 // 1000 AS cx,
        |    (event_id * 16807) % 8000 // 1000 AS cy
        |  FROM events),
        |h AS (SELECT user_id, cx, cy,
        |        lag(cx) OVER (PARTITION BY user_id
        |          ORDER BY es, event_id) AS pcx,
        |        lag(cy) OVER (PARTITION BY user_id
        |          ORDER BY es, event_id) AS pcy
        |      FROM ev)
        |SELECT pcx AS from_cx, pcy AS from_cy, cx AS to_cx, cy AS to_cy,
        |  count(*) AS n_trips
        |FROM h WHERE pcx IS NOT NULL AND (pcx <> cx OR pcy <> cy)
        |GROUP BY 1, 2, 3, 4 HAVING count(*) >= 3
        |ORDER BY from_cx, from_cy, to_cx, to_cy""".stripMargin
  )
}
