package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The prefix-min identity must equal Page's recursive CUSUM exactly —
  * property-tested against a brute-force sequential fold on deterministic
  * pseudo-random series of varied lengths and drifts. */
class ChangepointSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("changepoint-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Recursive reference: S_t = max(0, S_{t-1} + (x_t·D − Σx)). */
  private def ref(xs: Seq[Long]): Seq[Long] = {
    val d = xs.length.toLong
    val tot = xs.sum
    xs.scanLeft(0L) { (s, x) => math.max(0L, s + (x * d - tot)) }.tail
  }

  test("prefix-min identity matches the recursive definition") {
    val s = spark
    import s.implicits._
    // 7 keys, lengths 1..60, mixed flat/drift/step series
    val series: Map[String, Seq[Long]] = (0 until 7).map { k =>
      val n = 1 + (k * 17 + 3) % 60
      val xs = (0 until n).map { t =>
        val base = 10L + (t * 2654435761L + k * 48271L) % 7
        if (k % 3 == 1 && t > n / 2) base + 9 else base // step shift
      }
      s"k$k" -> xs
    }.toMap
    val rows = series.toSeq.flatMap { case (k, xs) =>
      xs.zipWithIndex.map { case (x, t) => (k, t.toLong, x) }
    }
    val out = Changepoint.cusum(rows.toDF("key", "t", "x"), "key", "t", "x")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("cusum"))
      .toMap
    series.foreach { case (k, xs) =>
      val expect = ref(xs)
      expect.zipWithIndex.foreach { case (e, t) =>
        assert(out((k, t.toLong)) === e, s"key=$k t=$t")
      }
    }
  }

  test("alarm fires exactly when cusum exceeds num/denom of the total") {
    val s = spark
    import s.implicits._
    val xs = Seq(5L, 5L, 5L, 5L, 20L, 20L, 20L, 5L)
    val rows = xs.zipWithIndex.map { case (x, t) => ("a", t.toLong, x) }
    val got = Changepoint.cusum(rows.toDF("key", "t", "x"),
        "key", "t", "x", num = 1, denom = 4)
      .orderBy("t").collect()
    val tot = xs.sum
    val cus = ref(xs)
    got.zipWithIndex.foreach { case (r, t) =>
      assert(r.getAs[Long]("cusum") === cus(t))
      assert(r.getAs[Int]("alarm") === (if (cus(t) * 4 > tot) 1 else 0))
    }
  }
}
