package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class FrequentSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("frequent-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Skewed Zipf-ish stream: item "h<i>" appears 200/(i+1) times for
    * i < 8, plus a 300-item uniform tail of singletons — forces both
    * the decrement-all eviction path (k << distinct) and cross-partition
    * merges with the (k+1)-th-largest subtraction. */
  private def skewed(s: SparkSession) = {
    import s.implicits._
    val rows = (0 until 8).flatMap(i => Seq.fill(200 / (i + 1))(s"h$i")) ++
      (0 until 300).map(i => s"t$i")
    // deterministic interleave so heads aren't clustered in one partition
    val shuffled = rows.zipWithIndex
      .sortBy { case (_, ix) => (ix * 2654435761L) % 1000003 }.map(_._1)
    s.sparkContext.parallelize(shuffled, 4).toDF("w")
  }

  test("sketch candidates contain every item with freq > N/(k+1)") {
    val df = skewed(spark)
    val n = df.count()
    val k = 10
    val cand = df.agg(Frequent.misraGries(col("w"), k).as("c"))
      .head().getSeq[String](0)
    assert(cand.size <= k, s"state exceeded k: ${cand.size}")
    val truth = df.groupBy("w").count()
      .where(col("count") * (k + 1) > n)
      .collect().map(_.getString(0)).toSet
    assert(truth.nonEmpty, "fixture must have true heavy hitters")
    truth.foreach(t => assert(cand.contains(t),
      s"guaranteed heavy hitter $t missing from candidates $cand"))
  }

  test("heavyHitters equals the brute-force exact set, any partitioning") {
    for (parts <- Seq(1, 4)) {
      val df = skewed(spark).repartition(parts)
      val k = 12
      val n = df.count()
      val got = Frequent.heavyHitters(df, "w", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = df.groupBy("w").count()
        .where(col("count") * (k + 1) > n)
        .collect().map(r => (r.getString(0), r.getLong(1), n)).toSet
      assert(got == want, s"parts=$parts got=$got want=$want")
    }
  }

  test("nulls are skipped and k=1 degenerates to majority candidate") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("a"), None, Some("a"), Some("b"), Some("a"), None)
      .toDF("w")
    val hh = Frequent.heavyHitters(df.where(col("w").isNotNull), "w", 1)
      .collect()
    // "a" has 3 of 4 non-null > 4/2
    assert(hh.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 3L)))
  }
}
