package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class WeightedStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("weightedstats-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Brute reference: expand each row w times, ceiling-rank into the
    * expanded list. */
  private def ref(rows: Seq[(Long, Long)], p: Int): Long = {
    val expanded = rows.sortBy(identity)
      .flatMap { case (v, w) => Seq.fill(w.toInt)(v) }
    expanded(((expanded.length.toLong * p + 99) / 100 - 1).toInt)
  }

  test("matches weight-expansion brute force for n in 1..60, p in {50,90,99}") {
    val s = spark
    import s.implicits._
    for (n <- Seq(1, 2, 7, 31, 60)) {
      val rows = (0 until n).map(i =>
        (i.toLong, (i * i * 31L) % 500, (i * 17L) % 5 + 1))
      val df = rows.toDF("id", "v", "w").withColumn("g", lit("x"))
      val got = WeightedStats.weightedPercentiles(df, "g", "v", "w", "id",
          Seq(50, 90, 99)).collect().head
      val vw = rows.map(r => (r._2, r._3))
      assert(got.getLong(1) == vw.map(_._2).sum, s"n=$n total_w")
      for ((p, i) <- Seq(50, 90, 99).zipWithIndex)
        assert(got.getLong(2 + i) == ref(vw, p), s"n=$n p=$p")
    }
  }

  test("degenerates to exactPercentiles at w = 1") {
    val s = spark
    import s.implicits._
    val rows = (0 until 97).map(i => ("g" + i % 3, (i * i * 37L) % 800,
      i.toLong))
    val df = rows.toDF("g", "v", "id").withColumn("w", lit(1L))
    val wp = WeightedStats.weightedPercentiles(df, "g", "v", "w", "id",
        Seq(50, 90))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val ep = PipelineOps.exactPercentiles(df, "g", "v", "id", Seq(50, 90))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(wp == ep)
  }
}
