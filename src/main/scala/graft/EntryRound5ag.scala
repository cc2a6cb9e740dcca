package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong
import graft.fixtures.Pages

/** Round-5 thirty-third batch: Geary's C (the dispersion companion that
  * completes the Moran pair), spatial colocation mining (which language
  * pairs share cells beyond chance — the categorical face of the
  * autocorrelation layer), and the built-in `session_window` streaming
  * aggregation gated by a batch twin (the last classic streaming
  * aggregate not yet exercised; gap-merge semantics are session_window's
  * EXCLUSIVE rule, deliberately distinct from q48's inclusive batch
  * recipe). */
object EntryRound5ag {

  private[graft] val seq = new AtomicLong(0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q239_geary_c" -> ((s, dir) => {
      val pts = Pages.geotag(Pages.pages(s, dir))
        .select((col("x") / 500).cast("long").as("cx"),
          (col("y") / 500).cast("long").as("cy"))
      graft.cells.Autocorr.gearyC(pts, "cx", "cy", 16, 16)
    }),

    // colocation lift per language pair: n_ab·N / (n_a·n_b) over cell
    // presence sets — cell-support-sized self-join, exact integer ladder
    "q240_colocation" -> ((s, dir) => {
      val pres = Pages.geotag(Pages.pages(s, dir))
        .select((col("x") / 500).cast("long").as("cx"),
          (col("y") / 500).cast("long").as("cy"), col("lang"))
        .distinct()
        .transform(graft.spark.PersistTracker.persist)
      val nCells = pres.select("cx", "cy").distinct().count()
      val perLang = pres.groupBy("lang").agg(count(lit(1)).as("n1"))
      val pairs = pres.as("a")
        .join(pres.as("b"),
          col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
            col("a.lang") < col("b.lang"))
        .groupBy(col("a.lang").as("la"), col("b.lang").as("lb"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(perLang.select(col("lang").as("la"), col("n1").as("n_a")),
          "la")
        .join(perLang.select(col("lang").as("lb"), col("n1").as("n_b")),
          "lb")
        .select(col("la"), col("lb"), col("n_a"), col("n_b"), col("n_ab"),
          expr(s"(1000000 * n_ab * ${nCells}L) div (n_a * n_b)")
            .as("lift_e6"))
    }),

    // streaming session_window aggregation (30-min gap) over the event
    // stream; a far-future sentinel advances the watermark so append
    // mode flushes every session; rollup columns mirror the batch twin
    "q241_session_stream" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val mem = MemoryStream[(Long, Long)](s)
      val qname = s"q241_sw_${seq.incrementAndGet()}"
      val q = mem.toDF().toDF("user_id", "tus")
        .select(col("user_id"), timestamp_micros(col("tus")).as("ts"))
        .withWatermark("ts", "1 second")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"))
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("tus"))
        .orderBy("tus")
        .as[(Long, Long)].collect()
      val (first, second) = ev.splitAt(ev.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      // sentinel: watermark past every real session's end
      mem.addData((-1L, ev.map(_._2).max + 86400L * 1000000L))
      q.processAllAvailable()
      val out = s.createDataFrame(
        java.util.Arrays.asList(s.table(qname).collect(): _*),
        s.table(qname).schema)
      q.stop()
      out.where(col("user_id") >= 0)
    })
  )

  def oracles: Map[String, String] = Map(

    "q239_geary_c" ->
      s"""WITH pg AS (${Pages.geotaggedSql}),
         |pts AS (SELECT CAST(floor(x / 500) AS BIGINT) AS cx,
         |               CAST(floor(y / 500) AS BIGINT) AS cy FROM pg),
         |lat AS (SELECT a.g AS cx, b.g AS cy
         |        FROM (SELECT unnest(range(16)) AS g) a,
         |             (SELECT unnest(range(16)) AS g) b),
         |cnt AS (SELECT cx, cy, count(*) AS c FROM pts GROUP BY 1, 2),
         |cells AS (SELECT lat.cx, lat.cy,
         |            CAST(coalesce(cnt.c, 0) AS HUGEINT) AS n
         |          FROM lat LEFT JOIN cnt USING (cx, cy)),
         |tot AS (SELECT CAST(sum(n) AS HUGEINT) AS s,
         |               CAST(count(*) AS HUGEINT) AS nc FROM cells),
         |d AS (SELECT cx, cy, nc * n - s AS d FROM cells, tot),
         |off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
         |                              (0,1),(1,-1),(1,0),(1,1)) o(dx, dy)),
         |pairs AS (SELECT a.d AS da, b.d AS db
         |          FROM d a, off, d b
         |          WHERE b.cx = a.cx + off.dx AND b.cy = a.cy + off.dy),
         |agg AS (SELECT CAST(count(*) AS HUGEINT) AS w,
         |          CAST(sum((da - db) * (da - db)) AS HUGEINT) AS num
         |        FROM pairs),
         |den AS (SELECT CAST(sum(d * d) AS HUGEINT) AS den FROM d)
         |SELECT CAST(nc AS BIGINT) AS n_cells, CAST(w AS BIGINT) AS w_pairs,
         |  CAST(s AS BIGINT) AS n_points,
         |  CAST(CASE WHEN den = 0 OR w = 0 THEN 0
         |       ELSE (1000000 * (nc - 1) * num) // (2 * w * den) END
         |    AS BIGINT) AS geary_e6
         |FROM tot, agg, den""".stripMargin,

    "q240_colocation" ->
      s"""WITH pg AS (${Pages.geotaggedSql}),
         |pres AS (SELECT DISTINCT CAST(floor(x / 500) AS BIGINT) AS cx,
         |           CAST(floor(y / 500) AS BIGINT) AS cy, lang FROM pg),
         |nc AS (SELECT count(*) AS n FROM
         |        (SELECT DISTINCT cx, cy FROM pres)),
         |pl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n1
         |       FROM pres GROUP BY 1),
         |pr AS (SELECT a.lang AS la, b.lang AS lb,
         |         CAST(count(*) AS BIGINT) AS n_ab
         |       FROM pres a JOIN pres b
         |         ON a.cx = b.cx AND a.cy = b.cy AND a.lang < b.lang
         |       GROUP BY 1, 2)
         |SELECT pr.la, pr.lb, pa.n1 AS n_a, pb.n1 AS n_b, pr.n_ab,
         |  CAST((1000000::HUGEINT * pr.n_ab * nc.n)
         |    // (pa.n1 * pb.n1) AS BIGINT) AS lift_e6
         |FROM pr JOIN pl pa ON pr.la = pa.lang
         |        JOIN pl pb ON pr.lb = pb.lang
         |        CROSS JOIN nc""".stripMargin,

    // session_window's EXCLUSIVE gap rule: a new session starts when the
    // gap is >= 30 min (events merge only while next < prev + gap);
    // window end = last event + gap
    "q241_session_stream" ->
      """WITH l AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
        |      AS prev
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev IS NULL
        |        OR tus - prev >= 1800000000 THEN 1 ELSE 0 END AS nw
        |      FROM l),
        |s AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY tus
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM f)
        |SELECT user_id, CAST(min(tus) AS BIGINT) AS start_us,
        |  CAST(max(tus) + 1800000000 AS BIGINT) AS end_us,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin
  )
}
