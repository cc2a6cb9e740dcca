package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The same windowedStats transform must produce identical results on a
  * bounded DataFrame (batch) and an unbounded MemoryStream (streaming) —
  * one codepath, two execution modes. */
class EventWindowsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("streaming-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("streaming windowed agg matches batch on the same events") {
    import spark.implicits._
    val rows = Seq(
      (1L, ts(0), "click", 1.0), (2L, ts(1), "click", 5.0),
      (3L, ts(2), "view", 2.0),  (4L, ts(6), "click", 7.0),
      (5L, ts(7), "view", 3.0),  (6L, ts(12), "click", 9.0))

    val batch = EventWindows.windowedStats(
        rows.toDF("event_id", "ts", "event_type", "value"))
      .orderBy("w_start", "event_type").collect().map(_.toString).toSeq

    val mem = MemoryStream[(Long, Timestamp, String, Double)](spark)
    val q = EventWindows.windowedStats(
        mem.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("win")
      .outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("win")
      .orderBy("w_start", "event_type").collect().map(_.toString).toSeq
    q.stop()

    assert(streamed == batch)
    assert(batch.size == 5) // 3 windows; click/view split in the first two
  }

  test("dropDuplicatesWithinWatermark removes replayed events") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, String, Double)](spark)
    val q = EventWindows.dedupEvents(
        mem.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    mem.addData((1L, ts(0), "click", 1.0), (2L, ts(1), "view", 2.0))
    q.processAllAvailable()
    mem.addData((1L, ts(0), "click", 1.0), (3L, ts(2), "view", 3.0)) // replay id 1
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }
}
