package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ChunkingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("chunking-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Plain-Scala CDC reference: rolling hash over trailing w chars. */
  private def refChunks(t: String, w: Int, divisor: Int): Seq[String] = {
    def h(i: Int): Long = // window ending at 1-based i
      (i - w until i).foldLeft(0L)((a, j) => (a * 31 + t.charAt(j)) % Chunking.Mod)
    val bs = (w to t.length).filter(i => h(i) % divisor == 0)
    val cuts = 0 +: bs :+ t.length
    cuts.sliding(2).collect {
      case Seq(a, b) if b > a => t.substring(a, b)
    }.toSeq
  }

  test("chunk set matches the reference fold and reassembles the text") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again and again",
      "a" * 100,
      "ab" * 60,
      "short",
      "deterministic rolling hash chunking resynchronizes after edits quickly")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Chunking.chunks(df, "doc_id", "text", w = 8, divisor = 16)
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    for ((t, i) <- texts.zipWithIndex) {
      val ref = refChunks(t, 8, 16)
      assert(ref.mkString("") == t, s"reference must reassemble doc $i")
      val refMd5 = ref.distinct.map { c =>
        java.security.MessageDigest.getInstance("MD5").digest(c.getBytes)
          .map("%02x".format(_)).mkString
      }.toSet
      assert(got(i.toLong) == refMd5, s"doc $i chunk hashes")
    }
  }

  test("boundaries resynchronize after a prefix edit (shift robustness)") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 6
    val edited = "EDIT! " + base
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val ch = Chunking.chunks(df, "doc_id", "text", w = 8, divisor = 16)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val a = ch.filter(_._1 == 1L).map(_._2).toSet
    val b = ch.filter(_._1 == 2L).map(_._2).toSet
    val shared = (a intersect b).size
    assert(shared >= (a.size * 2) / 3,
      s"prefix edit must preserve most chunks: shared $shared of ${a.size}")
  }

  test("sharedPairs honors the doc-frequency cap") {
    val s = spark
    import s.implicits._
    // direct chunk table: every doc holds the ubiquitous chunk C (df=6);
    // odd docs share O, even docs share E. Under the cap C never joins,
    // so pairs stay within a parity group; lifting the cap pairs everyone.
    val ch = (1L to 6L).flatMap { i =>
      Seq((i, "C")) :+ (i, if (i % 2 == 1) "O" else "E")
    }.toDF("doc_id", "chunk_md5")
    val capped = Chunking.sharedPairs(ch, maxDocFreq = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.nonEmpty && capped.forall { case (a, b) => a % 2 == b % 2 },
      s"df-capped pairs must not cross the parity groups: $capped")
    val uncapped = Chunking.sharedPairs(ch, maxDocFreq = 6, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.exists { case (a, b) => a % 2 != b % 2 },
      s"without the cap the shared chunk must pair across groups: $uncapped")
  }
}
