package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Update-mode stateful twins of the crawl aggregations (q132 CDX
  * capture-dedup, q115/q122 decay density) — the shape that is RIGHT at
  * scale, where the complete-mode memory sinks of the parity harness are
  * not: output carries only the keys updated in each micro-batch, and the
  * state store holds exactly one row per key with event-time eviction
  * once the watermark passes a key's last activity plus the retention.
  *
  * Keys are structural: `groupByKey` on `(url, digest)` / `(ix, iy)`
  * tuples, so nothing else — in particular no document text — can enter
  * the state store (the parity spec also asserts this against the
  * executed plan). */
object StatefulCrawl {

  private def retentionMs(retention: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(retention))
    require(iv.months == 0, s"retention must not use months: $retention")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** CDX capture-dedup state, update mode: per (url, content-digest) the
    * first-seen timestamp and capture count. Input columns: url, ts
    * (epoch seconds), text. State: two longs per key. A key whose last
    * capture fell `retention` behind the watermark is evicted — late
    * captures for an evicted key restart its count, the documented
    * trade-off of bounded state. */
  def cdxStateUpdate(captures: DataFrame, retention: String): DataFrame = {
    val spark = captures.sparkSession
    import spark.implicits._
    val retMs = retentionMs(retention)
    val typed = captures
      .select(col("url"), col("ts").cast("long").as("ts"),
        md5(col("text")).as("digest"),
        timestamp_seconds(col("ts")).as("ets"))
      .withWatermark("ets", retention)
      .as[(String, Long, String, java.sql.Timestamp)]
    typed.groupByKey(r => (r._1, r._3))
      .flatMapGroupsWithState[(Long, Long), (String, String, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case ((url, digest), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var firstTs = if (state.exists) state.get._1 else Long.MaxValue
            var n = if (state.exists) state.get._2 else 0L
            var maxEtsMs = Long.MinValue
            rows.foreach { r =>
              firstTs = math.min(firstTs, r._2)
              n += 1
              maxEtsMs = math.max(maxEtsMs, r._4.getTime)
            }
            state.update((firstTs, n))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs + 1, maxEtsMs + retMs))
            Iterator.single((url, digest, firstTs, n))
          }
      }
      .toDF("url", "digest", "first_ts", "n_caps")
  }

  /** Conversion-funnel state, update mode: per user the earliest signup
    * and the first purchase landing within `windowUs` (event-time micros) after it. State is
    * two longs per ACTIVE user; event-time timeout evicts users whose
    * window can no longer convert. Emits an update row whenever the
    * user's (signup, purchase) pair improves; the final table is the
    * min-reconstruction over updates (both fields monotone non-increasing
    * per user). Assumes per-user event-time-ordered arrival (upstream
    * watermark reordering at scale; exactly true for the harness feed). */
  def funnelStateUpdate(events: DataFrame, windowUs: Long,
                        retention: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val retMs = retentionMs(retention)
    val typed = events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type"), col("tus").cast("long").as("tus"),
        expr("timestamp_micros(tus)").as("ets"))
      .withWatermark("ets", retention)
      .as[(Long, String, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var signup = if (state.exists) state.get._1 else Long.MaxValue
            var purch = if (state.exists) state.get._2 else Long.MaxValue
            var maxEtsMs = Long.MinValue
            // deterministic in-batch order: event time, SIGNUP FIRST on a
            // timestamp tie — lexicographic ("purchase" < "signup") would
            // process a same-microsecond purchase before its signup and
            // drop it, diverging from the batch oracle's tus >= s
            // (round-5 advice, low)
            rows.toSeq.sortBy(r =>
              (r._3, if (r._2 == "signup") 0 else 1)).foreach { r =>
              maxEtsMs = math.max(maxEtsMs, r._4.getTime)
              if (r._2 == "signup") signup = math.min(signup, r._3)
              else if (r._2 == "purchase" && signup != Long.MaxValue &&
                r._3 >= signup && r._3 <= signup + windowUs)
                purch = math.min(purch, r._3)
            }
            state.update((signup, purch))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs + 1, maxEtsMs + retMs))
            if (signup == Long.MaxValue) Iterator.empty
            else Iterator.single((userId, signup,
              if (purch == Long.MaxValue) -1L else purch))
          }
      }
      .toDF("user_id", "signup_us", "purchase_us")
  }

  /** Decay-density state, update mode: per (ix, iy) cell the page count
    * and running integer weight sum. Input columns: ix, iy, w (the
    * per-page decay weight computed upstream — q115's exact integer
    * half-life arithmetic), ts (epoch seconds, event time). */
  def decayStateUpdate(points: DataFrame, retention: String): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val retMs = retentionMs(retention)
    val typed = points
      .select(col("ix").cast("long"), col("iy").cast("long"),
        col("w").cast("long"), timestamp_seconds(col("ts")).as("ets"))
      .withWatermark("ets", retention)
      .as[(Long, Long, Long, java.sql.Timestamp)]
    typed.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case ((ix, iy), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var n = if (state.exists) state.get._1 else 0L
            var wSum = if (state.exists) state.get._2 else 0L
            var maxEtsMs = Long.MinValue
            rows.foreach { r =>
              n += 1
              wSum += r._3
              maxEtsMs = math.max(maxEtsMs, r._4.getTime)
            }
            state.update((n, wSum))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs + 1, maxEtsMs + retMs))
            Iterator.single((ix, iy, n, wSum))
          }
      }
      .toDF("ix", "iy", "n_pages", "w_sum")
  }
}
