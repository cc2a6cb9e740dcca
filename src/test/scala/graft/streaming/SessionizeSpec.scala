package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import Sessionize.Event

/** Custom-state streaming (flatMapGroupsWithState) vs the window-function
  * batch twin: identical sessions once the watermark closes everything. */
class SessionizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false").appName("session-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$sec%02d")

  private val events = Seq(
    Event(1, ts(0), 1.0), Event(1, ts(1), 2.0),    // user 1 session A (gap 3m)
    Event(1, ts(10), 3.0),                         // user 1 session B
    Event(2, ts(0, 30), 5.0),                      // user 2 single session
    Event(2, ts(2), 7.0),
    Event(3, ts(5), 11.0))                         // user 3 single event

  test("streaming sessions equal the batch twin after watermark closure") {
    import spark.implicits._

    val batch = Sessionize.sessionizeBatch(
        events.toDF("user_id", "ts", "value"), gapSec = 180)
      .orderBy("user_id", "session_start")
      .collect().map(_.toString).toSeq
    assert(batch.size == 4) // 1A, 1B, 2, 3

    val mem = MemoryStream[Event](spark)
    val stream = Sessionize.sessionizeStream(
      mem.toDS().withWatermark("ts", "0 seconds"), gapSec = 180)
    val q = stream.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    // push the watermark far past every session end + gap
    mem.addData(Event(99, ts(59), 0.0))
    q.processAllAvailable()
    mem.addData(Event(99, ts(59, 30), 0.0)) // one more batch so timeouts fire
    q.processAllAvailable()
    val streamed = spark.table("sessions")
      .where(col("user_id") < 99)
      .orderBy("user_id", "session_start")
      .collect().map(_.toString).toSeq
    q.stop()

    assert(streamed == batch)
  }
}
