package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class CanonicalClusterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("canonical-cluster-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("keeps the highest-quality member, ties to the smallest id") {
    val s = spark
    import s.implicits._
    // cluster 1: ids 1,2,3 with q 5,9,9 -> canonical 2 (tie 2 vs 3)
    // cluster 10: singleton keeps itself
    val members = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L))
      .toDF("id", "rep")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 0L)).toDF("id", "q")
    val out = PipelineOps.canonicalPerCluster(
        members, "id", "rep", quality, "id", "q")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == ((2L, 0)))
    assert(out(2L) == ((2L, 1)))
    assert(out(3L) == ((2L, 0)))
    assert(out(10L) == ((10L, 1)))
  }

  test("exactly one keeper per cluster, regardless of partitioning") {
    val s = spark
    import s.implicits._
    val members = (1L to 100L).map(i => (i, i % 7)).toDF("id", "rep")
    val quality = (1L to 100L).map(i => (i, (i * 31) % 13)).toDF("id", "q")
    for (parts <- Seq(1, 5)) {
      val out = PipelineOps.canonicalPerCluster(
          members.repartition(parts), "id", "rep", quality, "id", "q")
        .collect()
      val byRep = out.groupBy(_.getLong(1))
      assert(byRep.values.forall(_.count(_.getInt(3) == 1) == 1))
      // canonical is argmax by (q desc, id asc) within the cluster
      val q = quality.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      byRep.foreach { case (_, rows) =>
        val ids = rows.map(_.getLong(0))
        val want = ids.minBy(i => (-q(i), i))
        assert(rows.forall(_.getLong(2) == want))
      }
    }
  }
}
