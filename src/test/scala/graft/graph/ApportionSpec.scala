package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ApportionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("apportion-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("quotas sum to exactly the budget and are partition-invariant") {
    val s = spark
    import s.implicits._
    val scores = (1 to 113).map(i => (f"dom$i%03d", ((i * 7919L) % 997L) + 1L))
      .toDF("key", "s")
    for (budget <- Seq(100L, 9973L); parts <- Seq(1, 5)) {
      val out = Apportion.largestRemainder(scores.repartition(parts),
        "key", "s", budget).collect()
      assert(out.map(_.getAs[Long]("quota")).sum == budget,
        s"budget=$budget parts=$parts")
      // each quota within 1 of the exact proportional share
      val sTot = 113L * 0 + scores.collect().map(_.getLong(1)).sum
      out.foreach { r =>
        val ideal = budget.toDouble * r.getAs[Long]("s") / sTot
        val q = r.getAs[Long]("quota")
        assert(q >= math.floor(ideal) && q <= math.floor(ideal) + 1,
          s"${r.getString(0)}: quota $q vs ideal $ideal")
      }
      // determinism across partitioning
      val again = Apportion.largestRemainder(scores.repartition(7),
        "key", "s", budget).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
      out.foreach(r =>
        assert(again(r.getString(0)) == r.getAs[Long]("quota")))
    }
  }

  test("soft dedup keeps each unique doc and ~one copy per dup group") {
    val s = spark
    import s.implicits._
    import graft.text.PipelineOps
    val corpus = ((1L to 100L).map(i => (i, s"unique text $i")) ++
      (1L to 60L).map(i => (1000L + i, "common boilerplate A")) ++
      (1L to 9L).map(i => (2000L + i, "common boilerplate B")))
      .toDF("id", "text")
    val out = PipelineOps.softDedupWeights(corpus, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(3)))).toMap
    // uniques always survive
    (1L to 100L).foreach(i => assert(out(i) == ((1L, 1))))
    // dup groups: kept count is within a small band of the expectation (1)
    val keptA = (1L to 60L).count(i => out(1000L + i)._2 == 1)
    val keptB = (1L to 9L).count(i => out(2000L + i)._2 == 1)
    assert(keptA <= 4, s"group A kept $keptA of 60 (expected ~1)")
    assert(keptB <= 3, s"group B kept $keptB of 9 (expected ~1)")
    assert(out(1001L)._1 == 60L && out(2001L)._1 == 9L)
  }
}
