package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class StrPackSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 7) // odd on purpose
      .config("spark.ui.enabled", "false")
      .appName("strpack-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pts(n: Int): Seq[(Long, Long, Long)] =
    (0 until n).map(i =>
      (i.toLong, (i * 48271L) % 997, (i * 16807L) % 997))

  test("distributed rank equals the brute-force sort position") {
    val s = spark
    import s.implicits._
    val data = pts(500)
    val got = StrPack.groupedRank(
        data.toDF("id", "x", "y"), Nil, "x", "id", "r")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    graft.spark.PersistTracker.drain()
    val exp = data.sortBy(p => (p._2, p._1)).zipWithIndex
      .map { case (p, i) => p._1 -> (i + 1L) }.toMap
    assert(got === exp)
  }

  test("STR leaves are balanced to +-1 and reproduce brute force") {
    val s = spark
    import s.implicits._
    val data = pts(333)
    val got = StrPack.pack(data.toDF("id", "x", "y"), "x", "y", "id", 4, 4)
      .select("id", "leaf")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.spark.PersistTracker.drain()
    // brute force STR
    val n = data.size
    val bySlice = data.sortBy(p => (p._2, p._1)).zipWithIndex
      .map { case (p, i) => (p, i * 4 / n) }
    val exp = bySlice.groupBy(_._2).flatMap { case (slice, rows) =>
      val m = rows.size
      rows.map(_._1).sortBy(p => (p._3, p._1)).zipWithIndex.map {
        case (p, j) => p._1 -> (slice * 4 + j * 4 / m).toLong
      }
    }
    assert(got === exp.toMap)
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).values
    assert(sizes.max - sizes.min <= 1)
  }
}
