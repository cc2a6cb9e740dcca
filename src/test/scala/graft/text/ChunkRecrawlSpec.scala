package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** chunkTokens / recrawlDelta / anchorTextIndex unit gates (q94/q95/q93's
  * oracle checks the closed-form fixtures; these pin the operator
  * semantics on adversarial shapes). */
class ChunkRecrawlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("chunk-recrawl-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("chunkTokens: tiling covers every token exactly, overlap = size-stride") {
    val txt = (1 to 95).map(i => s"t$i").mkString(" ") // 95 tokens
    val out = PipelineOps.chunkTokens(docs(1L -> txt), "doc_id", "text",
        chunkSize = 40, stride = 30)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // chunks at 0, 30, 60, 90; last is the 5-token tail
    assert(out.toSeq === Seq((0L, 0L, 40L), (1L, 30L, 40L),
      (2L, 60L, 35L), (3L, 90L, 5L)))
    // full coverage: union of [start, start+len) = [0, 95)
    val covered = out.flatMap { case (_, s0, l) => s0 until (s0 + l) }.toSet
    assert(covered === (0L until 95L).toSet)
  }

  test("chunkTokens: doc shorter than one chunk yields exactly one chunk") {
    val out = PipelineOps.chunkTokens(docs(1L -> "a b c"), "doc_id", "text",
        chunkSize = 40, stride = 30).collect()
    assert(out.length === 1)
    assert(out.head.getLong(3) === 3L) // tok_len
  }

  test("chunkTokens: stride == chunkSize degenerates to packSequences tiling") {
    val txt = (1 to 10).map(_.toString).mkString(" ")
    val out = PipelineOps.chunkTokens(docs(1L -> txt), "doc_id", "text",
        chunkSize = 4, stride = 4)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 4L), (4L, 4L), (8L, 2L)))
  }

  test("recrawlDelta classifies new / changed / unchanged") {
    val prev = docs(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
    val batch = docs(2L -> "beta", 3L -> "GAMMA2", 4L -> "delta")
    val out = PipelineOps.recrawlDelta(batch, "doc_id", "text",
        prev, "doc_id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq === Seq((2L, "unchanged"), (3L, "changed"), (4L, "new")))
  }

  test("recrawlDelta plan: no exchange carries the text columns") {
    val prev = docs(1L -> "alpha")
    val batch = docs(1L -> "alpha", 2L -> "b")
    val plan = PipelineOps.recrawlDelta(batch, "doc_id", "text",
      prev, "doc_id", "text").queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      val cols = e.output.map(_.name)
      assert(!cols.contains("text"), s"exchange carries text: $cols")
    }
  }

  test("vocabTopK: exact ranks with count-desc/token-asc tiebreak, salt-invariant") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "en", "a a a b b c d"),
      (2L, "en", "b c c e"),
      (3L, "fr", "x y y")
    ).toDF("doc_id", "lang", "text")
    // en counts: a=3, b=3, c=3, d=1, e=1 → top3 = a, b, c (tie by token)
    val out = PipelineOps.vocabTopK(df, "lang", "text", k = 3)
      .orderBy("lang", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3)))
    assert(out.toSeq === Seq(
      ("en", "a", 3L, 1), ("en", "b", 3L, 2), ("en", "c", 3L, 3),
      ("fr", "y", 2L, 1), ("fr", "x", 1L, 2)))
    // result must not depend on the salt count (pruning superset property)
    val s1 = PipelineOps.vocabTopK(df, "lang", "text", k = 3, salts = 1)
      .orderBy("lang", "rank").collect().toSeq
    val s64 = PipelineOps.vocabTopK(df, "lang", "text", k = 3, salts = 64)
      .orderBy("lang", "rank").collect().toSeq
    assert(s1 === s64)
  }

  test("bigramPmi: exact micro-nat scores against hand math") {
    // one doc: "a b a b a b" → bigrams: (a,b)x3, (b,a)x2; unigrams a=3 b=3
    // N=6 tokens, B=5 bigrams
    val df = docs(1L -> "a b a b a b")
    val out = PipelineOps.bigramPmi(df, "doc_id", "text", minCount = 2)
      .orderBy("w1").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    def pmi(c: Long, c1: Long, c2: Long): Long =
      math.round(math.log((c * 6L * 6L) / (5L * c1 * c2 * 1.0)) * 1e6)
    assert(out(("a", "b")) === ((3L, pmi(3, 3, 3))))
    assert(out(("b", "a")) === ((2L, pmi(2, 3, 3))))
  }

  test("bigramPmi: minCount prunes and bigrams never cross documents") {
    // "x y" in two docs (c=2); the doc boundary between y|x must not
    // create a (y, x) bigram
    val df = docs(1L -> "x y", 2L -> "x y")
    val out = PipelineOps.bigramPmi(df, "doc_id", "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq === Seq(("x", "y")))
  }

  test("anchorTextIndex aggregates (dst_domain, anchor_text)") {
    val s = spark
    import s.implicits._
    val pages = Seq(
      (1L, """<p>x</p><a href="https://a.org/1">hello</a><a class="z" href="https://b.org/2">world</a>"""),
      (2L, """<a href="https://a.org/9" rel="nofollow">hello</a>""")
    ).toDF("doc_id", "html")
    val out = PipelineOps.anchorTextIndex(pages, "doc_id", "html")
      .orderBy("dst_domain", "anchor_text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(("a.org", "hello", 2L, 2L),
      ("b.org", "world", 1L, 1L)))
  }
}
