package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class BatchingContainmentSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("batching-containment-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("lengthBucketedBatches: fill order, bucket edges, pad accounting") {
    val s = spark
    import s.implicits._
    // 10 docs of length 3 (bucket 0 at width 16) + one of length 17 (bucket 1)
    val docs = ((0L until 10L).map(i => (i, "a b c")) :+
      (99L, (1 to 17).map(_ => "w").mkString(" "))).toDF("doc_id", "text")
    val got = Batching.lengthBucketedBatches(docs, "doc_id", "text",
        bucketWidth = 16, batchSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      (0L, 0L) -> ((4L, 3L, 0L)), (0L, 1L) -> ((4L, 3L, 0L)),
      (0L, 2L) -> ((2L, 3L, 0L)), (1L, 0L) -> ((1L, 17L, 0L))))
  }

  test("lengthBucketedBatches: pad_waste counts the rectangle slack") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a"), (2L, "a b"), (3L, "a b c")).toDF("doc_id", "text")
    val row = Batching.lengthBucketedBatches(docs, "doc_id", "text", 16, 8)
      .collect().head
    // one batch: max 3, sum 6, waste 3·3−6 = 3
    assert((row.getLong(2), row.getLong(3), row.getLong(4)) === ((3L, 3L, 3L)))
  }

  test("containmentPairs: exact quote inside a longer page scores 1000 one-way") {
    val s = spark
    import s.implicits._
    val quote = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      1L -> quote,
      2L -> s"intro words here $quote and a very long tail of other words")
      .toDF("doc_id", "text")
    val got = Containment.containmentPairs(docs, "doc_id", "text",
        n = 3, tauMilli = 800)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.spark.PersistTracker.drain()
    // all 7 trigrams of doc 1 appear in doc 2 → containment(1 in 2) = 1000;
    // doc 2 has many extra trigrams → containment(2 in 1) < 800
    assert(got === Map((1L, 2L) -> 1000L))
  }

  test("containmentPairs matches a brute-force reference on seeded texts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0L until 40L).map { i =>
      i -> (1 to (rnd.nextInt(20) + 3)).map(_ => vocab(rnd.nextInt(5))).mkString(" ")
    }
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val ref = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia != ib
      sa = shingles(ta) if sa.nonEmpty
      shared = (sa & shingles(tb)).size
      cm = 1000L * shared / sa.size if cm >= 600
    } yield (ia, ib) -> cm).toMap
    val got = Containment.containmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, tauMilli = 600)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.spark.PersistTracker.drain()
    assert(got === ref)
    assert(ref.nonEmpty)
  }

  test("containmentPairs: maxDf prunes hot shingles and only lowers scores") {
    val s = spark
    import s.implicits._
    val docs = ((0L until 20L).map(i => i -> "x y z common tail words") :+
      (100L -> "x y z unique one two three")).toDF("doc_id", "text")
    val loose = Containment.containmentPairs(docs, "doc_id", "text", 3, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pruned = Containment.containmentPairs(docs, "doc_id", "text", 3, 0,
        maxDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.spark.PersistTracker.drain()
    assert(pruned.keySet.subsetOf(loose.keySet))
    assert(pruned.forall { case (k, v) => v <= loose(k) })
  }
}
