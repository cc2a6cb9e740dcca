package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the custom-state streaming operator
  * (KeyValueGroupedDataset.flatMapGroupsWithState) with a window-function
  * batch twin producing identical sessions on bounded input.
  *
  * A session is a maximal run of one user's events where consecutive event
  * times are ≤ gap apart. Streaming state per user = the open session;
  * sessions emit when the event-time watermark passes their end + gap
  * (EventTimeTimeout), so state is bounded and results are append-only. */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           sum_value: Double)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, sum: Double)

  /** Batch twin: lag + cumulative new-session flags + group. */
  def sessionizeBatch(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("__prev", lag("ts", 1).over(byUser))
      .withColumn("__new",
        // millisecond precision — must match the streaming path's getTime
        // arithmetic or sub-second gaps split differently batch vs stream
        // (casts make TIMESTAMP_NTZ parquet columns work too)
        when(col("__prev").isNull ||
             unix_millis(col("ts").cast("timestamp")) -
               unix_millis(col("__prev").cast("timestamp")) > gapSec * 1000, 1)
          .otherwise(0))
      .withColumn("__sid", sum("__new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "__sid")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
           count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .drop("__sid")
  }

  /** Streaming path: custom state via flatMapGroupsWithState. Input must
    * carry a watermark on ts (caller sets it). */
  def sessionizeStream(events: Dataset[Event], gapSec: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000

    def fn(user: Long, rows: Iterator[Event],
           state: GroupState[OpenSession]): Iterator[Session] = {
      def emit(s: OpenSession) = Session(user,
        new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.sum)

      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).iterator
        state.remove()
        return out
      }
      // merge the batch's events (sorted by time) into sessions
      val sorted = rows.toVector.sortBy(_.ts.getTime)
      var open = state.getOption
      val closed = Vector.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.lastMs <= gapMs =>
            // a late event may precede the open session's start — keep min
            open = Some(OpenSession(math.min(s.startMs, t), math.max(s.lastMs, t),
              s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed += emit(s)
            open = Some(OpenSession(t, t, 1, e.value))
          case None =>
            open = Some(OpenSession(t, t, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // fire once the watermark passes session end + gap; clamp to
        // watermark+1 — flatMapGroupsWithState does NOT drop pre-watermark
        // late events, and a timeout at-or-before the current watermark
        // throws IllegalArgumentException and kills the query
        state.setTimeoutTimestamp(
          math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
      }
      closed.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
