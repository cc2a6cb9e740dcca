package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class Round5fSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("round5f-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("rrfFuse: hand-computed fusion of two tiny rankings") {
    val s = spark
    import s.implicits._
    val r1 = Seq((0, 1, 10L), (0, 2, 20L)).toDF("qid", "rank", "id")
    val r2 = Seq((0, 1, 20L), (0, 2, 30L)).toDF("qid", "rank", "id")
    val got = graft.text.Fusion.rrfFuse(Seq(r1, r2), k = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 20: 1000000/62 + 1000000/61 = 16129 + 16393 = 32522 (2 lists)
    // doc 10: 1000000/61 = 16393; doc 30: 1000000/62 = 16129
    assert(got.toSeq === Seq((1, 20L, 32522L, 2L), (2, 10L, 16393L, 1L),
      (3, 30L, 16129L, 1L)))
  }

  test("newVsCorpusPairs: finds cross-boundary near-dups, never old-old") {
    val s = spark
    import s.implicits._
    val mk = (i: Long, t: String) => (i, t)
    val corpus = Seq(
      mk(1, "a b c d e f g h i j"),
      mk(2, "a b c d e f g h i j"), // old-old exact dup must NOT appear
      mk(3, "z y x w v u t s r q")).toDF("doc_id", "text")
    val batch = Seq(
      mk(100, "a b c d e f g h i j k"), // near-dup of 1 and 2
      mk(101, "totally different words here nothing shared at all ok fine"))
      .toDF("doc_id", "text")
    val got = graft.text.IncrementalDedup.newVsCorpusPairs(
        corpus, batch, "doc_id", "text", tau = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.spark.PersistTracker.drain()
    assert(got === Set((100L, 1L), (100L, 2L)))
  }

  test("mrrAtK: first-hit rank, zero-hit query, recall units") {
    val s = spark
    import s.implicits._
    val topk = Seq((0, 1, 5L), (0, 2, 6L), (0, 3, 7L),
      (1, 1, 8L), (1, 2, 9L)).toDF("qid", "rank", "id")
    val gold = Seq((0, 6L), (0, 7L), (0, 99L), (1, 55L)).toDF("qid", "id")
    val got = graft.text.EvalOps.mrrAtK(topk, gold)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // q0: 3 gold, hits {6@2, 7@3} -> first 2, mrr 500000, recall 666
    assert(got(0) === ((3L, 2L, 2L, 500000L, 666L)))
    // q1: 1 gold, no hits -> all zeros
    assert(got(1) === ((1L, 0L, 0L, 0L, 0L)))
  }

  test("hashSplitCol is deterministic and not id-arithmetic-preserved") {
    val s = spark
    import s.implicits._
    val ids = (0L until 2000L).toDF("id")
      .select(col("id"), graft.text.EvalOps.hashSplitCol(col("id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val testShare = ids.values.count(_ == 1).toDouble / ids.size
    assert(testShare > 0.10 && testShare < 0.30) // ~3/16 expected
    // a shifted-id copy must often change split (id mod k never would)
    val moved = (0L until 1000L).count(i => ids(i) != ids(i + 1000L))
    assert(moved > 100)
  }

  test("splitLeaks keeps only cross-split pairs") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L, 0.9), (3L, 4L, 0.95)).toDF("id_a", "id_b", "jac")
    val splits = Seq((1L, 0), (2L, 1), (3L, 0), (4L, 0)).toDF("id", "split")
    val got = graft.text.EvalOps.splitLeaks(pairs, splits)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }
}
