package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class PostingsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("postings-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("varintLen at every 7-bit boundary, and encode length agrees") {
    val boundaries = Seq(0L, 1L, 127L, 128L, 16383L, 16384L,
      2097151L, 2097152L, 268435455L, 268435456L,
      (1L << 56) - 1, 1L << 56, Long.MaxValue)
    for (v <- boundaries) {
      val enc = Postings.encodeDeltas(Seq(v))
      assert(enc.length === Postings.varintLen(v), s"v=$v")
      assert(Postings.decodeDeltas(enc) === Seq(v), s"v=$v")
    }
  }

  test("roundtrip over seeded random strictly-increasing lists") {
    val rnd = new scala.util.Random(123)
    for (_ <- 1 to 50) {
      val n = rnd.nextInt(200) + 1
      val ids = Iterator.iterate(rnd.nextInt(1000).toLong)(
        p => p + rnd.nextInt(100000) + 1).take(n).toSeq
      val enc = Postings.encodeDeltas(ids)
      assert(Postings.decodeDeltas(enc) === ids)
      // byte count = Σ varintLen over first-absolute + gaps
      val expect = Postings.varintLen(ids.head) +
        ids.sliding(2).collect { case Seq(a, b) => Postings.varintLen(b - a) }.sum
      assert(enc.length === expect)
    }
  }

  test("encode rejects non-increasing and negative ids; decode rejects truncation") {
    intercept[IllegalArgumentException](Postings.encodeDeltas(Seq(5L, 5L)))
    intercept[IllegalArgumentException](Postings.encodeDeltas(Seq(5L, 3L)))
    intercept[IllegalArgumentException](Postings.encodeDeltas(Seq(-1L)))
    val enc = Postings.encodeDeltas(Seq(300L)) // 2 bytes, first has cont bit
    intercept[IllegalArgumentException](Postings.decodeDeltas(enc.take(1)))
  }

  test("compressedSegments: every segment round-trips and bytes match a local re-encode") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a b a"), (1L, "a c"), (127L, "a"), (128L, "a b"),
      (300L, "b b c"), (301L, "")).toDF("doc_id", "text")
    val rows = Postings.compressedSegments(docs, "doc_id", "text", segmentSize = 128)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    // expected lists per (term, segment)
    val lists = Map(
      ("a", 0L) -> Seq(0L, 1L, 127L), ("a", 1L) -> Seq(128L),
      ("b", 0L) -> Seq(0L), ("b", 1L) -> Seq(128L), ("b", 2L) -> Seq(300L),
      ("c", 0L) -> Seq(1L), ("c", 2L) -> Seq(300L))
    assert(rows.keySet === lists.keySet)
    for ((k, ids) <- lists) {
      val (df, first, last, bytes, ok) = rows(k)
      assert(df === ids.size.toLong && first === ids.head && last === ids.last, k)
      assert(bytes === Postings.encodeDeltas(ids).length.toLong, k)
      assert(ok, k)
    }
  }
}
