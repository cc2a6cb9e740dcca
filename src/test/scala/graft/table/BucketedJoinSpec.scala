package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The q154 contract: co-bucketed tables join WITHOUT a shuffle exchange
  * on either side — asserted against the physical plan with broadcast
  * joins disabled so the exchange-free SortMergeJoin is forced visible. */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("bucketed-join-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("co-bucketed equi-join: SortMergeJoin with zero shuffle exchanges") {
    val s = spark
    import s.implicits._
    val base = (0L until 1000L).map(i => (i, i % 7, s"v$i"))
    val left = Bucketed.writeTable(
      base.toDF("k", "grp", "payload"),
      "bspec_left", "/tmp/graft_bspec_left_" + s.sparkContext.applicationId,
      buckets = 8, keyCol = "k")
    val right = Bucketed.writeTable(
      base.map { case (k, g, _) => (k, g * 10) }.toDF("k", "w"),
      "bspec_right", "/tmp/graft_bspec_right_" + s.sparkContext.applicationId,
      buckets = 8, keyCol = "k")
    val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = left.join(right, "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan must be bucket-aware:\n$plan")
      // values survive the layout round-trip
      assert(joined.count() === 1000L)
      assert(joined.agg(sum(col("w"))).head().getLong(0) ===
        base.map(_._2 * 10).sum)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("a non-bucketed twin of the same join DOES shuffle (the contrast probe)") {
    val s = spark
    import s.implicits._
    val a = (0L until 1000L).map(i => (i, i % 7)).toDF("k", "grp")
    val b = (0L until 1000L).map(i => (i, i * 10)).toDF("k", "w")
    val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = a.join(b, "k").queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"),
        s"control plan should shuffle:\n$plan")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }
}
