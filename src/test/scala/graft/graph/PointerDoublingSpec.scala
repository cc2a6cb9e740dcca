package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class PointerDoublingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("pointerdoubling-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("resolves a 1000-deep chain plus side branches to their terminals") {
    val s = spark
    import s.implicits._
    // chain 1000 -> 999 -> … -> 0, plus branches 2000+i -> i*10
    val ptr = ((1L to 1000L).map(i => (i, i - 1)) ++
      (0L until 50L).map(i => (2000L + i, i * 10L))).toDF("src", "dst")
    val got = PointerDoubling.resolve(ptr, maxRounds = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 1050)
    assert((1L to 1000L).forall(i => got(i) == 0L),
      "every chain node must resolve to the root")
    for (i <- 0L until 50L) {
      val exp = if (i == 0L) 0L else 0L // i*10 is on the chain -> root 0
      assert(got(2000L + i) == exp, s"branch $i")
    }
  }

  test("forest with several terminals keeps them separate") {
    val s = spark
    import s.implicits._
    val ptr = Seq((10L, 5L), (5L, 2L), (20L, 15L), (30L, 30L - 1))
      .toDF("src", "dst")
    val got = PointerDoubling.resolve(ptr)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 2L, 5L -> 2L, 20L -> 15L, 30L -> 29L))
  }

  test("a cycle fails loudly instead of looping") {
    val s = spark
    import s.implicits._
    val ptr = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      PointerDoubling.resolve(ptr, maxRounds = 6)
    }
    assert(e.getMessage.contains("cycle") || e.getMessage.contains("unresolved"))
  }

  test("two pointers from one node are rejected") {
    val s = spark
    import s.implicits._
    val ptr = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      PointerDoubling.resolve(ptr)
    }
    assert(e.getMessage.contains("functional"))
  }
}
