package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class WinnowingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("winnowing-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Reference winnow in plain Scala: md5-hex every k-gram, min of each
    * w-window, distinct. */
  private def refFingerprints(t: String, k: Int, w: Int): Set[String] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val grams = (0 to t.length - k).map(i => md5hex(t.substring(i, i + k)))
    if (grams.length < w) Set.empty
    else grams.sliding(w).map(_.min).toSet
  }

  test("matches the plain-Scala reference winnow on varied strings") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaa", // degenerate: all grams equal
      "abcdefghij",             // exactly enough for one window at k=8? no
      "short",                  // below k -> no fingerprints
      "spark catalyst tungsten whole stage codegen pipelines")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Winnowing.fingerprints(docs, k = 8, w = 4, maxChars = 300)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(1)).toSet }
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = refFingerprints(t.take(300), 8, 4)
      assert(got.getOrElse(i.toLong, Set.empty) == want, s"doc $i")
    }
  }

  test("w+k-1 guarantee: a shared substring always shares a fingerprint") {
    val s = spark
    import s.implicits._
    val k = 8; val w = 4
    val shared = "zxqvwjkp melting glacier retreat"  // 32 >= w + k - 1 = 11
    val docs = Seq(
      (1L, s"first document preamble $shared and then a different tail"),
      (2L, s"$shared completely other content follows here after")
    ).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(docs, k, w, maxChars = 300)
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(1)).toSet }
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
  }

  test("sharedPairs finds the planted copy and honors the stop cut") {
    val s = spark
    import s.implicits._
    val boiler = "common boilerplate footer shared by every single document"
    def body(i: Long): String =
      (0 until 12).map(j => s"tok${i}x$j").mkString(" ")
    val docs = (0L until 8L).map(i => (i, s"${body(i)} $boiler")) :+
      (100L, s"${body(3L)} $boiler") // exact copy of doc 3's unique body
    val fps = Winnowing.fingerprints(docs.toDF("doc_id", "text"), 8, 4, 300)
    val pairs = Winnowing.sharedPairs(fps, maxDocFreq = 4, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the planted copy pairs up: the boilerplate fingerprints have
    // doc-freq 9 > maxDocFreq and are cut before pair generation
    assert(pairs == Set((3L, 100L)), s"got $pairs")
  }

  test("fingerprints are partition-invariant") {
    val s = spark
    import s.implicits._
    val docs = (0L until 40L)
      .map(i => (i, s"document number $i body " * 4 + i.toString))
      .toDF("doc_id", "text")
    val one = Winnowing.fingerprints(docs.repartition(1), 8, 4, 300)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val many = Winnowing.fingerprints(docs.repartition(7), 8, 4, 300)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(one == many)
  }
}
