package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Update-mode stateful crawl aggregations: per-batch update semantics,
  * state-store key/plan contracts, and event-time eviction — the scale
  * behaviors the complete-mode parity twins (q132/q122) cannot show. */
class StatefulCrawlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("stateful-crawl-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def runCdx(batches: Seq[Seq[(String, Long, String)]],
                     retention: String): (DataFrame, String) = {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[(String, Long, String)](s)
    val qname = s"cdxu_spec_${seq.incrementAndGet()}"
    val q = StatefulCrawl.cdxStateUpdate(
        mem.toDF().toDF("url", "ts", "text"), retention)
      .writeStream.format("memory").queryName(qname)
      .outputMode("update").start()
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    val plan = q.asInstanceOf[StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    val out = s.createDataFrame(
      java.util.Arrays.asList(s.table(qname).collect(): _*),
      s.table(qname).schema)
    q.stop()
    (out, plan)
  }

  test("update mode emits only the keys a micro-batch touched; the " +
       "reconstructed final state matches the batch aggregation") {
    val b1 = Seq(("a", 100L, "x"), ("a", 200L, "x"), ("b", 150L, "y"))
    val b2 = Seq(("a", 300L, "x"), ("c", 250L, "z"))
    val (sink, plan) = runCdx(Seq(b1, b2), retention = "3650 days")
    // b only updated in batch 1 → exactly one sink row for it
    assert(sink.where(col("url") === "b").count() == 1)
    // a updated in both batches → two rows, counts 2 then 3
    val aRows = sink.where(col("url") === "a").orderBy("n_caps")
      .collect().map(r => (r.getAs[Long]("first_ts"), r.getAs[Long]("n_caps")))
    assert(aRows.toSeq == Seq((100L, 2L), (100L, 3L)))
    // final state (min first_ts / max n_caps per key) == batch groupBy
    val fin = sink.groupBy("url", "digest")
      .agg(min("first_ts").as("first_ts"), max("n_caps").as("n_caps"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("first_ts"), r.getAs[Long]("n_caps")))).toMap
    assert(fin == Map("a" -> ((100L, 3L)), "b" -> ((150L, 1L)),
      "c" -> ((250L, 1L))))
    // plan contract: the stateful operator keys on (url, digest) only —
    // document text must never reach the state store
    assert(plan.contains("FlatMapGroupsWithState"), plan)
    val stateLines = plan.split("\n")
      .filter(_.contains("FlatMapGroupsWithState"))
    stateLines.foreach(l => assert(!l.contains("text#"),
      s"document text in the stateful operator:\n$l"))
  }

  test("event-time timeout evicts idle keys; a late capture restarts the " +
       "count — the bounded-state trade-off, observable") {
    // retention 10 s. Batch 2 pushes the watermark ~past a+10s; batch 3
    // (no data for a) fires a's timeout and removes its state; batch 4
    // sees a again and restarts at n_caps = 1.
    val (sink, _) = runCdx(Seq(
      Seq(("a", 100L, "x")),
      Seq(("b", 10000L, "y")),
      Seq(("c", 10001L, "z")),
      Seq(("a", 10005L, "x"))), retention = "10 seconds")
    val aCounts = sink.where(col("url") === "a").orderBy("first_ts")
      .collect().map(r => (r.getAs[Long]("first_ts"), r.getAs[Long]("n_caps")))
    assert(aCounts.toSeq == Seq((100L, 1L), (10005L, 1L)),
      s"expected eviction then restart, got ${aCounts.toSeq}")
  }

  test("decay state: exact integer weight sums per (ix, iy), update mode") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[(Long, Long, Long, Long)](s)
    val qname = s"decayu_spec_${seq.incrementAndGet()}"
    val q = StatefulCrawl.decayStateUpdate(
        mem.toDF().toDF("ix", "iy", "w", "ts"), retention = "3650 days")
      .writeStream.format("memory").queryName(qname)
      .outputMode("update").start()
    mem.addData((0L, 0L, 1000000L, 100L), (0L, 0L, 500000L, 200L),
      (1L, 2L, 250000L, 150L))
    q.processAllAvailable()
    mem.addData((0L, 0L, 125000L, 300L))
    q.processAllAvailable()
    val fin = s.table(qname).groupBy("ix", "iy")
      .agg(max("n_pages").as("n"), max("w_sum").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("w")))).toMap
    q.stop()
    assert(fin == Map((0L, 0L) -> ((3L, 1625000L)),
      (1L, 2L) -> ((1L, 250000L))))
  }
}
