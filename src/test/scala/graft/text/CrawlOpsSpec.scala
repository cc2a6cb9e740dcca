package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class CrawlOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("crawl-ops-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("boilerplateChunks flags exactly the cross-doc template chunks") {
    val s = spark
    import s.implicits._
    // 4-token chunks; docs a,b,c of domain x share the header "nav one two
    // three"; doc d of domain y has the same header but is alone in its
    // domain (threshold is PER DOMAIN)
    val docs = Seq(
      (1L, "x", "nav one two three alpha beta gamma delta"),
      (2L, "x", "nav one two three epsilon zeta eta theta"),
      (3L, "x", "nav one two three iota kappa lambda mu"),
      (4L, "y", "nav one two three nu xi omicron pi")
    ).toDF("id", "domain", "text")
    val out = CrawlOps.boilerplateChunks(docs, "id", "domain", "text",
        chunkTokens = 4, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 1L, 50L)))
    assert(out(2L) == ((2L, 1L, 50L)))
    assert(out(3L) == ((2L, 1L, 50L)))
    assert(out(4L) == ((2L, 0L, 0L))) // same text, different domain: clean
  }

  test("boilerplateChunks: ragged tail chunk participates in matching") {
    val s = spark
    import s.implicits._
    // 9 tokens with chunkTokens=4 -> 3 chunks, last of length 1; identical
    // docs so every chunk (tail included) crosses the threshold
    val docs = Seq(
      (1L, "x", "a b c d e f g h i"),
      (2L, "x", "a b c d e f g h i")
    ).toDF("id", "domain", "text")
    val out = CrawlOps.boilerplateChunks(docs, "id", "domain", "text",
        chunkTokens = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 3L && out(2L) == 3L)
  }

  test("cdxIndex: surt transform and revisit classification") {
    val s = spark
    import s.implicits._
    val caps = Seq(
      ("https://www.example.org/a", 100L, "hello"),
      ("https://www.example.org/a", 200L, "hello"),  // byte-identical later
      ("https://www.example.org/a", 300L, "changed"),
      ("https://other.net/", 50L, "x")
    ).toDF("url", "ts", "text")
    val rows = CrawlOps.cdxIndex(caps, "url", "ts", "text")
      .orderBy("surt", "ts")
      .select("surt", "ts", "op").as[(String, Long, String)].collect()
    assert(rows.toSeq == Seq(
      ("net,other)/", 50L, "response"),
      ("org,example,www)/a", 100L, "response"),
      ("org,example,www)/a", 200L, "revisit"),
      ("org,example,www)/a", 300L, "response")))
  }

  test("tfidfTopK matches the brute-force reference and is salt-invariant") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark join spark"),
      (2L, "join window"),
      (3L, "spark spark spark window"),
      (4L, "merge stream")
    ).toDF("id", "text")
    val queries = Seq(1 -> Seq("spark"), 2 -> Seq("join", "window"))
    // brute force: same integer idf then exact scoring
    val n = 4L
    val corpus = Map(
      1L -> Seq("spark", "join", "spark"), 2L -> Seq("join", "window"),
      3L -> Seq("spark", "spark", "spark", "window"),
      4L -> Seq("merge", "stream"))
    val dfreq = corpus.values.flatMap(_.distinct).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    def idf(w: String) =
      math.round(math.log((n + 1.0) / (dfreq(w) + 1L)) * 1e6)
    val expected = (for {
      (qid, terms) <- queries
      (id, toks) <- corpus
      if terms.exists(toks.contains) // no matching term -> no posting row
      score = terms.map(t => toks.count(_ == t).toLong * idf(t)).sum
    } yield (qid, id, score))
      .groupBy(_._1).toSeq.flatMap { case (qid, xs) =>
        xs.sortBy(x => (-x._3, x._2)).take(3).zipWithIndex
          .map { case ((q, id, sc), i) => (q, i + 1, id, sc) }
      }.sortBy(x => (x._1, x._2))
    for (salts <- Seq(1, 4, 16)) {
      val got = CrawlOps.tfidfTopK(docs, "id", "text", queries, k = 3,
          salts = salts)
        .orderBy("qid", "rank")
        .as[(Int, Int, Long, Long)].collect().toSeq
      assert(got == expected, s"salts=$salts")
    }
  }
}
