package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.Pages

/** Round-5 twenty-second batch: the composite spatiotemporal join
  * (space cell × time bucket as ONE equi-join key) and the dataset
  * release card — each gated by a closed-form DuckDB oracle. */
object EntryRound5v {

  // (zone id, x0, x1, y0, y1, epoch start, epoch end) — integer-corner
  // rects and half-open [start, end) day-aligned windows; event points
  // sit at .5 offsets so no point ever lies on a zone boundary
  private val Zones = Seq(
    ("Z1", 500L, 2300L, 500L, 2300L, 1704067200L, 1704499200L),
    ("Z2", 4000L, 5800L, 1000L, 2800L, 1704499200L, 1705104000L),
    ("Z3", 6000L, 7800L, 6000L, 7800L, 1704067200L, 1706659200L),
    ("Z4", 0L, 1800L, 6200L, 8000L, 1705968000L, 1706572800L))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // spatiotemporal join: events × incident zones through ONE composite
    // (cell-x, cell-y, day-bucket) equi-join — the 3-D cell-cover trick
    // (zones explode their rect's cells × their window's days; events
    // compute theirs closed-form), exact rect+window test in the join —
    // never events × zones
    "q209_spacetime_join" -> ((s, dir) => {
      import s.implicits._
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"),
          (expr("(event_id * 48271) % 8000").cast("double") + 0.5).as("x"),
          (expr("(event_id * 16807) % 8000").cast("double") + 0.5).as("y"),
          unix_timestamp(col("ts").cast("timestamp")).as("es"))
        .withColumn("cx", floor(col("x") / 1000.0).cast("long"))
        .withColumn("cy", floor(col("y") / 1000.0).cast("long"))
        .withColumn("db", expr("es div 86400"))
      val zones = Zones.toDF("zid", "x0", "x1", "y0", "y1", "t0", "t1")
        .withColumn("cx", explode(sequence(expr("x0 div 1000"),
          expr("x1 div 1000"))))
        .withColumn("cy", explode(sequence(expr("y0 div 1000"),
          expr("y1 div 1000"))))
        .withColumn("db", explode(sequence(expr("t0 div 86400"),
          expr("(t1 - 1) div 86400"))))
      ev.join(broadcast(zones), Seq("cx", "cy", "db"))
        .where(col("x") > col("x0") && col("x") < col("x1") &&
          col("y") > col("y0") && col("y") < col("y1") &&
          col("es") >= col("t0") && col("es") < col("t1"))
        .groupBy("zid")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"))
        .orderBy("zid")
    }),

    // dataset release card: the one-row audit a corpus release ships —
    // sizes, language spread, exact-dup rate, token volume, spatial
    // coverage; every number independently predicted by the oracle
    "q210_release_card" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val base = d.agg(
        count(lit(1)).as("n_docs"),
        countDistinct("lang").as("n_langs"),
        sum("n_chars").as("total_chars"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_words"))
      val dup = d.groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("c"))
        .agg(sum(when(col("c") > 1, col("c") - 1).otherwise(0L))
          .as("n_redundant"))
      val cells = Pages.geotag(Pages.pages(s, dir))
        .select((floor(col("x") / 1000.0) * 8 + floor(col("y") / 1000.0))
          .cast("long").as("cell"))
        .agg(countDistinct("cell").as("n_cells"))
      base.crossJoin(dup).crossJoin(cells)
        .withColumn("dup_permille",
          expr("n_redundant * 1000 div n_docs"))
        .select("n_docs", "n_langs", "total_chars", "total_words",
          "n_redundant", "dup_permille", "n_cells")
    })
  )

  def oracles: Map[String, String] = Map(

    "q209_spacetime_join" -> {
      val zs = Zones.map { case (z, x0, x1, y0, y1, t0, t1) =>
        s"SELECT '$z' AS zid, $x0 AS x0, $x1 AS x1, $y0 AS y0, $y1 AS y1, $t0 AS t0, $t1 AS t1"
      }.mkString("\nUNION ALL ")
      s"""WITH ev AS (SELECT event_id, user_id,
         |    (event_id * 48271) % 8000 + 0.5 AS x,
         |    (event_id * 16807) % 8000 + 0.5 AS y,
         |    epoch_us(ts) // 1000000 AS es FROM events),
         |z AS ($zs)
         |SELECT zid, count(*) AS n_events,
         |  count(DISTINCT user_id) AS n_users
         |FROM ev JOIN z ON x > x0 AND x < x1 AND y > y0 AND y < y1
         |  AND es >= t0 AND es < t1
         |GROUP BY zid ORDER BY zid""".stripMargin
    },

    "q210_release_card" ->
      """WITH base AS (SELECT count(*) AS n_docs,
        |    count(DISTINCT lang) AS n_langs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words
        |  FROM documents),
        |dup AS (SELECT CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)
        |          AS BIGINT) AS n_redundant
        |        FROM (SELECT md5(text) AS h, count(*) AS c
        |              FROM documents GROUP BY 1)),
        |g AS (SELECT (doc_id * 48271) % 8000 AS xi,
        |        (doc_id * 16807) % 8000 AS yi FROM documents),
        |cells AS (SELECT count(DISTINCT
        |            CAST(floor(xi/1000.0) * 8 + floor(yi/1000.0) AS BIGINT))
        |            AS n_cells
        |          FROM g WHERE xi % 500 <> 0 AND yi % 500 <> 0)
        |SELECT n_docs, n_langs, total_chars, total_words, n_redundant,
        |  n_redundant * 1000 // n_docs AS dup_permille, n_cells
        |FROM base CROSS JOIN dup CROSS JOIN cells""".stripMargin
  )
}
