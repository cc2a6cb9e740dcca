package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 fifty-first batch: autocorrelation of daily event series
  * (exact integer numerators/denominators per lag), audio zero-crossing
  * rate over real WAV bytes, and identity stitching — users linked by
  * shared event properties, resolved with connected components. */
object EntryRound5ay {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // periodicity probe: ACF numerator Σ dev_t·dev_{t+h} and denominator
    // Σ dev² per (event_type, lag 1..7), devs scaled by the series
    // length (dev = cnt·D − Σcnt, so Σdev = 0 exactly) — a keyed
    // self-join on (type, day + h), everything integer
    "q291_autocorrelation" -> ((s, dir) => {
      val daily = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
            .as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      val dev = daily
        .withColumn("d", count(lit(1)).over(w))
        .withColumn("tot", sum("cnt").over(w))
        .withColumn("dev", expr("cnt * d - tot"))
        .select(col("event_type"), col("day"), col("dev"))
        .transform(graft.spark.PersistTracker.persist)
      val den = dev.groupBy("event_type")
        .agg(sum(expr("dev * dev")).as("acf_den"))
      val lags = s.range(1, 8).select(col("id").as("lag"))
      val num = dev.toDF("event_type", "day", "dev_a")
        .crossJoin(broadcast(lags))
        .join(dev.toDF("event_type", "day2", "dev_b"),
          Seq("event_type"))
        .where(col("day2") === col("day") + col("lag"))
        .groupBy("event_type", "lag")
        .agg(sum(expr("dev_a * dev_b")).as("acf_num"))
      num.join(broadcast(den), "event_type")
        .select(col("event_type"), col("lag"), col("acf_num"),
          col("acf_den"))
    }),

    // voiced/unvoiced screen: per-frame zero crossings over the q149
    // RIFF/WAVE fixture (junk chunks force the real chunk walk); the
    // oracle re-derives every sign change from the synthesis formula
    "q292_audio_zcr" -> ((s, dir) => {
      import graft.multimodal.{Containers, MultimodalOps}
      val mkWav = udf((docId: Long, nChars: Long) => {
        val n = ((nChars % 8).toInt + 1) * 64
        val data = new Array[Byte](n)
        var t = 0
        while (t < n) {
          data(t) = ((docId * 7 + 3L * t * t + t) % 256).toByte
          t += 1
        }
        Containers.Wav.write(8000, 1, 8, data,
          junkChunks = (docId % 3).toInt, junkLen = (docId % 5).toInt)
      })
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          mkWav(col("doc_id"), col("n_chars")).as("media"))
      MultimodalOps.decodeWavZeroCrossings(media, "doc_id", "media",
        frameLen = 64)
    }),

    // identity stitching: users sharing a props.k value are the same
    // principal — per-k star edges (min user ← user) then connected
    // components; the oracle closes the same pair set recursively
    "q293_identity_stitch" -> ((s, dir) => {
      val uk = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .where(col("k") % 7 === 0) // sparse signal: only some props link
        .distinct()
      val minu = uk.groupBy("k").agg(min("user_id").as("mu"))
      val pairs = uk.join(minu, "k")
        .where(col("user_id") =!= col("mu"))
        .select(col("mu").as("id_a"), col("user_id").as("id_b"))
        .distinct()
      val nodes = uk.select(col("user_id").as("id")).distinct()
      graft.text.TextOps.connectedComponents(nodes, pairs)
        .select(col("doc_id").as("user_id"),
          col("rep_id").as("identity_rep"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q291_autocorrelation" ->
      """WITH daily AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |dev AS (SELECT event_type, day,
        |    cnt * (count(*) OVER (PARTITION BY event_type))
        |      - (sum(cnt) OVER (PARTITION BY event_type)) AS dev
        |  FROM daily),
        |den AS (SELECT event_type, sum(dev * dev) AS acf_den FROM dev
        |        GROUP BY 1),
        |num AS (SELECT a.event_type, l.lag, sum(a.dev * b.dev) AS acf_num
        |  FROM dev a
        |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
        |  JOIN dev b ON b.event_type = a.event_type
        |           AND b.day = a.day + l.lag
        |  GROUP BY 1, 2)
        |SELECT num.event_type, CAST(lag AS BIGINT) AS lag,
        |  CAST(acf_num AS BIGINT) AS acf_num,
        |  CAST(acf_den AS BIGINT) AS acf_den
        |FROM num JOIN den ON den.event_type = num.event_type""".stripMargin,

    "q292_audio_zcr" ->
      """WITH d AS (SELECT doc_id, (n_chars % 8 + 1) * 64 AS n
        |           FROM documents),
        |t AS (SELECT doc_id, unnest(generate_series(1, n - 1)) AS t
        |      FROM d),
        |s AS (SELECT doc_id, t, t // 64 AS frame,
        |    ((doc_id*7 + 3*(t-1)*(t-1) + (t-1)) % 256) - 128 AS va,
        |    ((doc_id*7 + 3*t*t + t) % 256) - 128 AS vb
        |  FROM t WHERE t % 64 <> 0),
        |f AS (SELECT doc_id, frame,
        |    sum(CASE WHEN (va >= 0) <> (vb >= 0) THEN 1 ELSE 0 END) AS z
        |  FROM s GROUP BY 1, 2),
        |frames AS (SELECT doc_id,
        |    unnest(generate_series(0, n // 64 - 1)) AS frame
        |  FROM d)
        |SELECT frames.doc_id AS id, CAST(frames.frame AS BIGINT) AS frame,
        |  CAST(coalesce(f.z, 0) AS BIGINT) AS zcr
        |FROM frames LEFT JOIN f
        |  ON f.doc_id = frames.doc_id AND f.frame = frames.frame""".stripMargin,

    "q293_identity_stitch" ->
      """WITH RECURSIVE uk AS (SELECT DISTINCT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events
        |  WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0),
        |minu AS (SELECT k, min(user_id) AS mu FROM uk GROUP BY k),
        |p AS (SELECT DISTINCT minu.mu AS id_a, uk.user_id AS id_b
        |  FROM uk JOIN minu ON minu.k = uk.k
        |  WHERE uk.user_id <> minu.mu),
        |edges AS (SELECT id_a AS u, id_b AS v FROM p
        |          UNION ALL SELECT id_b, id_a FROM p),
        |nodes AS (SELECT DISTINCT user_id AS id FROM uk),
        |r AS (
        |  SELECT id AS u, id AS v FROM nodes
        |  UNION
        |  SELECT r.u, e.v FROM r JOIN edges e ON e.u = r.v)
        |SELECT u AS user_id, CAST(min(v) AS BIGINT) AS identity_rep
        |FROM r GROUP BY u""".stripMargin
  )
}
