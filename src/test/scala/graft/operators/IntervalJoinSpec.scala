package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class IntervalJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("interval-join-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def mkIntervals(n: Int, seed: Long, idCol: String, sCol: String,
                          eCol: String) = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      val st = ((i * 7919L + seed) % 1000L) * 100L
      (i.toLong, st, st + ((i * 31L + seed) % 7L + 1L) * 130L)
    }.toDF(idCol, sCol, eCol)
  }

  test("matches the brute-force predicate join for every bucket width") {
    val left = mkIntervals(200, 3, "lid", "ls", "le")
    val right = mkIntervals(37, 11, "rid", "rs", "re")
    val brute = left.crossJoin(right)
      .where(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture produced no overlaps")
    for (bucket <- Seq(50L, 300L, 5000L, 1000000L);
         bc <- Seq(false, true)) {
      val got = IntervalJoin.overlap(left, right, bucket, broadcastRight = bc)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.distinct.length,
        s"duplicate pairs at bucket=$bucket")
      assert(got.toSet == brute, s"bucket=$bucket broadcast=$bc")
    }
  }

  test("zero-length and touching intervals are inclusive matches") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, 100L), (2L, 200L, 250L)).toDF("lid", "ls", "le")
    val right = Seq((10L, 100L, 100L), (20L, 250L, 300L)).toDF("rid", "rs", "re")
    val got = IntervalJoin.overlap(left, right, 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }

  test("rejects a non-positive bucket width") {
    val df = mkIntervals(3, 1, "lid", "ls", "le")
    val r = mkIntervals(3, 2, "rid", "rs", "re")
    intercept[IllegalArgumentException] { IntervalJoin.overlap(df, r, 0L) }
  }
}
