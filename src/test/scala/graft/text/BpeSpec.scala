package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("bpe-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Plain-Scala greedy left-to-right non-overlapping merge. */
  private def refMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  test("applyMerge fold == greedy scan, including l = r runs") {
    val s = spark
    import s.implicits._
    // run-heavy cases where naive string replace diverges from greedy
    val words = Seq("aaa", "aaaa", "aaaaa", "ababab", "abab", "aabba",
      "xyxyxy", "abcabc", "ab", "a", "baaab", "aabaab")
    val cases = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("x", "y"))
    for ((l, r) <- cases) {
      val dict = words.map(w => (w, 1L, w.map(_.toString).mkString(" ")))
        .toDF("w", "freq", "syms")
      val got = Bpe.applyMerge(dict, l, r)
        .collect().map(x => x.getString(0) -> x.getString(2)).toMap
      for (w <- words) {
        val exp = refMerge(w.map(_.toString), l, r).mkString(" ")
        assert(got(w) == exp, s"w=$w merge=($l,$r): got '${got(w)}' exp '$exp'")
      }
    }
  }

  test("second-round merge where a symbol is multi-char (ab,ab)") {
    val s = spark
    import s.implicits._
    val dict = Seq(("abababa", 1L, "ab ab ab a"), ("abab", 2L, "ab ab"))
      .toDF("w", "freq", "syms")
    val got = Bpe.applyMerge(dict, "ab", "ab")
      .collect().map(x => x.getString(0) -> x.getString(2)).toMap
    assert(got("abababa") == "abab ab a")
    assert(got("abab") == "abab")
  }

  test("pairCounts weights by freq and spans multi-char symbols") {
    val s = spark
    import s.implicits._
    val dict = Seq(("low", 5L, "l o w"), ("lower", 2L, "l o w e r"),
      ("w", 9L, "w")).toDF("w", "freq", "syms")
    val got = Bpe.pairCounts(dict)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got(("l", "o")) == 7L)
    assert(got(("o", "w")) == 7L)
    assert(got(("w", "e")) == 2L)
    assert(got(("e", "r")) == 2L)
    assert(!got.contains(("w", "w")), "single-symbol words contribute no pairs")
  }

  /** Plain-Scala BPE trainer over a (word, freq) dict. */
  private def refTrain(dict: Map[String, Long], rounds: Int)
      : Seq[(String, String, Long)] = {
    var syms: Seq[(Seq[String], Long)] =
      dict.map { case (w, f) => (w.map(_.toString).toSeq, f) }.toSeq
    (1 to rounds).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((ss, f) <- syms; i <- 0 until ss.length - 1)
        counts((ss(i), ss(i + 1))) = counts.getOrElse((ss(i), ss(i + 1)), 0L) + f
      val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      syms = syms.map { case (ss, f) => (refMerge(ss, l, r), f) }
      (l, r, c)
    }
  }

  test("train matches the reference trainer round for round") {
    val s = spark
    import s.implicits._
    val dict = Map("banana" -> 6L, "bandana" -> 3L, "ananas" -> 2L,
      "nab" -> 7L, "aa" -> 4L, "aaaa" -> 1L)
    val df = dict.toSeq.toDF("w", "freq")
    val (_, merges) = Bpe.train(df, rounds = 4)
    val exp = refTrain(dict, 4)
    assert(merges.map(m => (m.lsym, m.rsym, m.pairCount)) == exp,
      s"got $merges exp $exp")
    // token accounting: recompute from the reference state
    var syms: Seq[(Seq[String], Long)] =
      dict.map { case (w, f) => (w.map(_.toString).toSeq, f) }.toSeq
    val refToks = exp.map { case (l, r, _) =>
      syms = syms.map { case (ss, f) => (refMerge(ss, l, r), f) }
      syms.map { case (ss, f) => ss.length * f }.sum
    }
    assert(merges.map(_.tokensAfter) == refToks)
  }
}
