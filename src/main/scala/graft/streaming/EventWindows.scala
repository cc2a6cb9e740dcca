package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming path for the `events` table. The reference is pure
  * batch (SURVEY §2.7) — this is the engine's forward-looking incremental
  * ingestion: the SAME declarative transform runs over a bounded DataFrame
  * (batch backfill) or an unbounded readStream (incremental), which is the
  * Spark-idiomatic way to keep one codepath for both.
  *
  * Streaming semantics: event-time tumbling windows with a watermark bound
  * on lateness; state is dropped once the watermark passes the window end,
  * so the job runs indefinitely with bounded memory. */
object EventWindows {

  /** Tumbling event-time window stats per event_type.
    * Input schema: (ts TIMESTAMP, event_type STRING, value DOUBLE, …). */
  def windowedStats(events: DataFrame,
                    windowLen: String = "5 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           min("value").as("vmin"),
           max("value").as("vmax"))
      .select(col("w.start").as("w_start"), col("event_type"),
              col("n"), col("vmin"), col("vmax"))

  /** Exactly-once-per-event dedup within the watermark horizon — the
    * streaming twin of exact dedup (TextOps.exactDedupGroups): late
    * duplicates of an event_id inside the horizon are dropped. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
