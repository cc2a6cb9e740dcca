package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class Bm25Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("bm25-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Single-threaded reference of the cleared-fraction formula. */
  private def ref(docs: Seq[(Long, String)], queries: Seq[(Int, Seq[String])],
                  k: Int): Seq[(Int, Int, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }
    val tf = toks.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => (id, w, g.size.toLong) } }
    val dl = toks.map { case (id, ws) => id -> ws.size.toLong }.toMap
    val n = dl.size.toLong
    val a = dl.values.sum
    val dfm = tf.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    queries.flatMap { case (qid, ws) =>
      val scores = tf.filter(t => ws.contains(t._2))
        .groupBy(_._1)
        .map { case (id, ts) =>
          id -> ts.map { case (_, w, f) =>
            val idf = math.round(
              math.log(1.0 + (n - dfm(w) + 0.5) / (dfm(w) + 0.5)) * 1e6)
            (idf * 22 * a * f) / (10 * a * f + 3 * a + 9 * dl(id) * n)
          }.sum }
      scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
        .zipWithIndex.map { case ((id, s), i) => (qid, i + 1, id, s) }
    }
  }

  test("matches the reference on a handcrafted corpus (ties, repeats, short docs)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (10L, "spark join join join scan"),
      (11L, "spark scan"),
      (12L, "scan scan scan scan scan scan scan scan"),
      (13L, "join filter window"),
      (14L, "window window spark"),
      (15L, "the quick fox"))
    val queries = Seq(0 -> Seq("join", "scan"), 1 -> Seq("spark", "window", "fox"))
    val got = CrawlOps.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
        queries, k = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got === ref(docs, queries, 4).sortBy(t => (t._1, t._2)))
    assert(got.nonEmpty && got.map(_._4).forall(_ > 0))
  }

  test("longer docs score lower at equal tf (the b·dl/avgdl length penalty)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "term pad pad pad pad pad pad pad pad pad pad pad pad pad pad"),
      (2L, "term pad"))
    val out = CrawlOps.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
        Seq(0 -> Seq("term")), k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(out(1) === 2L, "short doc must rank first")
  }

  test("empty corpus and oversized-A contract fail loud") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      CrawlOps.bm25TopK(Seq.empty[(Long, String)].toDF("doc_id", "text"),
        "doc_id", "text", Seq(0 -> Seq("x")), k = 1)
    }
  }
}
