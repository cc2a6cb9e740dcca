package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class HardNegativeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("hardneg-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def vec(i: Long): Array[Float] =
    Array.tabulate(8)(j => (((i * 31 + j * 17) % 13) - 6).toFloat)

  test("matches brute force and never returns the anchor's own label") {
    val s = spark
    import s.implicits._
    val rows = (0L until 60L).map(i => (i, vec(i).toSeq, (i % 4).toInt))
    val df = rows.toDF("vec_id", "embedding", "label")
    val anchors = df.where(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlab"))
    val corpus = df.select(col("vec_id").as("cid"),
      col("embedding").as("cvec"), col("label").as("clab"))
    val got = Similarity.hardNegativeTopK(anchors, corpus, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(3)) ->
        (r.getLong(1), r.getDouble(2))).toMap

    val lab = rows.map(r => r._1 -> r._3).toMap
    for (q <- 0L until 60L if q % 7 == 0) {
      val brute = rows.filter(_._3 != lab(q))
        .map { case (c, _, _) => (c, Similarity.cosine(vec(q), vec(c))) }
        .sortBy { case (c, cos) => (-cos, c) }
        .take(4)
      for ((exp, i) <- brute.zipWithIndex) {
        val g = got((q, i + 1))
        assert(g == exp, s"anchor $q rank ${i + 1}: got $g exp $exp")
        assert(lab(g._1) != lab(q), s"anchor $q returned its own label")
      }
    }
  }

  test("partition invariance of the bounded-heap pass") {
    val s = spark
    import s.implicits._
    val rows = (0L until 60L).map(i => (i, vec(i).toSeq, (i % 4).toInt))
    val df = rows.toDF("vec_id", "embedding", "label")
    val anchors = df.where(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlab"))
    def run(parts: Int) = {
      val corpus = df.repartition(parts).select(col("vec_id").as("cid"),
        col("embedding").as("cvec"), col("label").as("clab"))
      Similarity.hardNegativeTopK(anchors, corpus, k = 4)
        .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1)))
        .toSet
    }
    assert(run(1) == run(7))
  }
}
