package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Skew hardening of the MinHash-LSH path: exact-duplicate pre-collapse
  * must not change the output (it only shrinks the bucket join), and the
  * bucket-size contract must fail fast instead of attempting a quadratic
  * self-join. */
class MinHashSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("minhash-skew-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** corpus with heavy exact duplication + genuine near-dups: the worst
    * realistic LSH input shape. */
  private def corpus() = {
    val s = spark
    import s.implicits._
    val boiler = "subscribe to our newsletter for updates every single day ok"
    val baseDocs = Seq(
      10L -> "the quick brown fox jumps over the lazy dog again today",
      11L -> "the quick brown fox jumps over the lazy dog again tomorrow",
      12L -> "completely different content about database query planning here now",
      13L -> "completely different content about database query planning here soon")
    // 20 exact copies of the boilerplate (one hot cluster)
    val dups = (100L until 120L).map(i => i -> boiler)
    (baseDocs ++ dups).toDF("doc_id", "text")
  }

  test("pre-dedup path output equals the naive path exactly (all 3 modes)") {
    val df = corpus()
    def run(pre: PreCollapse) =
      TextOps.minHashLshPairs(df, "doc_id", "text",
          n = 3, numHashes = 64, bands = 32, tau = 0.8, preDedupExact = pre)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val naive = run(PreCollapse.Off)
    assert(run(PreCollapse.Probe) === naive)
    assert(run(PreCollapse.Assume) === naive)
    // sanity: the hot cluster produced its full intra-group pair set
    assert(naive.count { case (a, b, j) => a >= 100 && b >= 100 && j == 1.0 } === 190)
  }

  test("pre-dedup collapses the band table to one row per distinct text") {
    // 24 docs, 5 distinct texts (4 base + 1 boilerplate) -> banding sees 5 ids
    val df = corpus()
    val s = spark
    import s.implicits._
    val distinctTexts = df.select("text").distinct().count()
    // count ids entering the band explode by reusing the operator's public
    // output on a tau low enough to admit everything, then checking the
    // candidate universe: every returned id must be a doc id, and every
    // distinct text's group is fully represented
    val pairs = TextOps.minHashLshPairs(df, "doc_id", "text",
        n = 3, numHashes = 64, bands = 32, tau = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val idsInPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(distinctTexts === 5L)
    // all 20 dup members appear despite banding running on 5 reps
    assert((100L until 120L).forall(idsInPairs.contains))
  }

  test("simhash pre-dedup path output equals the naive path exactly (all 3 modes)") {
    val df = corpus()
    def run(pre: PreCollapse) =
      TextOps.simhashPairs(df, "doc_id", "text",
          n = 3, maxHamming = 8, tables = 9, preDedupExact = pre)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val naive = run(PreCollapse.Off)
    assert(run(PreCollapse.Probe) === naive)
    assert(run(PreCollapse.Assume) === naive)
    assert(naive.count { case (a, b, h) => a >= 100 && b >= 100 && h == 0 } === 190)
  }

  test("embedding pre-dedup path output equals the naive path exactly (all 3 modes)") {
    val s = spark
    import s.implicits._
    val base = Seq.tabulate(8)(i =>
      (i.toLong, Array.tabulate(16)(d => math.sin(i * 17 + d).toFloat)))
    // 15 exact copies of vector 0 (a hot LSH cluster) + a genuine near-dup
    val near = (100L, base(0)._2.map(v => v * 1.000001f))
    val dups = (200L until 215L).map(i => (i, base(0)._2))
    val df = (base ++ Seq(near) ++ dups).toDF("vec_id", "embedding")
    def run(pre: PreCollapse) =
      graft.ml.Similarity.embeddingNearDupPairs(df, tau = 0.99,
          preDedupExact = pre)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val naive = run(PreCollapse.Off)
    assert(run(PreCollapse.Probe) === naive)
    assert(run(PreCollapse.Assume) === naive)
    // the 16-member identical cluster (vec 0 + 15 copies) yields all pairs
    assert(naive.count(_._3 == 1.0) >= 120)
  }

  test("maxBucketSize fails fast with a diagnostic when a bucket is hot") {
    val df = corpus()
    val e = intercept[IllegalArgumentException] {
      TextOps.minHashLshPairs(df, "doc_id", "text",
        n = 3, numHashes = 64, bands = 32, tau = 0.8,
        preDedupExact = PreCollapse.Off, // identical docs all collide -> hot buckets
        maxBucketSize = Some(10L)).collect()
    }
    assert(e.getMessage.contains("maxBucketSize"))
  }

  test("maxBucketSize passes after pre-dedup collapses the hot bucket") {
    val df = corpus()
    val out = TextOps.minHashLshPairs(df, "doc_id", "text",
      n = 3, numHashes = 64, bands = 32, tau = 0.8,
      preDedupExact = PreCollapse.Assume, maxBucketSize = Some(10L))
    assert(out.count() > 0)
  }
}
