package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class Round5gSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("round5g-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bestWindows: densest window wins, ties go earliest, snippet text") {
    val s = spark
    import s.implicits._
    // terms at pos 2,3 cluster in window 0..7; a lone term at pos 12
    val docs = Seq(
      (1L, "a b hit hit c d e f g h i j hit n o p"),
      (2L, "hit z z z z z z z z z z z z z z z")).toDF("doc_id", "text")
    val topk = Seq((0, 1L), (0, 2L)).toDF("qid", "id")
    val got = graft.text.Snippets.bestWindows(docs, "doc_id", "text",
        topk, Seq(0 -> Seq("hit")), width = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    graft.spark.PersistTracker.drain()
    // doc 1: windows starting 0..2 hold both pos-2,3 hits (2 hits); the
    // earliest such start is 0
    assert(got((0, 1L)) === ((0L, 2L, "a b hit hit c d e f")))
    // doc 2: single hit at 0
    assert(got((0, 2L)) === ((0L, 1L, "hit z z z z z z z")))
  }

  test("bestWindows only reports (qid, id) pairs from the top-k") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma one two three four five six seven"),
      (2L, "alpha beta gamma one two three four five six seven"))
      .toDF("doc_id", "text")
    // doc 2 retrieved only for qid 1, but matches qid 0's term too
    val topk = Seq((0, 1L), (1, 2L)).toDF("qid", "id")
    val got = graft.text.Snippets.bestWindows(docs, "doc_id", "text", topk,
        Seq(0 -> Seq("alpha"), 1 -> Seq("beta")), width = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    graft.spark.PersistTracker.drain()
    assert(got === Set((0, 1L), (1, 2L)))
  }

  test("topKWeighted matches a brute-force reference draw") {
    val s = spark
    import s.implicits._
    val rows = (1L to 300L).map(i => (i, (i % 17) * 10 + 1))
    val got = graft.text.WeightedSample.topKWeighted(
        rows.toDF("id", "w"), "id", "w", k = 20)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    def hexVal(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until 6).map(i => Character.digit(h(i), 16).toLong << (4 * (5 - i))).sum
    }
    val ref = rows.map { case (id, w) =>
      (id, w.toLong,
        math.round(1000000.0 * math.log((hexVal(id) + 1) / 16777216.0) / w))
    }.sortBy { case (id, _, key) => (-key, id) }.take(20).zipWithIndex
      .map { case ((id, w, key), i) => (i + 1, id, key) }
    assert(got.toSeq === ref)
    // higher weight -> higher inclusion odds: top-20 mean weight above corpus mean
    val meanTop = got.map(_._2).sum.toDouble / got.length
    val meanAll = rows.map(_._2).sum.toDouble / rows.size
    assert(meanTop > meanAll)
  }
}
