package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("pipeline-ops-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // ------------------------------------------------------- paragraph dedup

  test("paragraphDedup keeps the globally-first (id, idx) per distinct paragraph") {
    val df = docs(
      1L -> "alpha\n\nshared",
      2L -> "shared\n\nbeta",
      3L -> "shared\n\nshared")
    val out = PipelineOps.paragraphDedup(df, "doc_id", "text")
      .orderBy("id", "idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3)))
    // "shared" first occurs at (1, 1); every later occurrence drops
    assert(out.toSeq === Seq(
      (1L, 0, true), (1L, 1, true),
      (2L, 0, false), (2L, 1, true),
      (3L, 0, false), (3L, 1, false)))
  }

  test("paragraphDedupStats counts per doc") {
    val df = docs(1L -> "a\n\nb", 2L -> "a\n\na\n\nc")
    val out = PipelineOps.paragraphDedupStats(df, "doc_id", "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 2L), (2L, 3L, 1L)))
  }

  test("dedupParagraphText reconstructs cleaned text in paragraph order") {
    val df = docs(1L -> "keep one\n\nboiler", 2L -> "boiler\n\nkeep two")
    val out = PipelineOps.dedupParagraphText(df, "doc_id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq(
      (1L, "keep one\n\nboiler"), // first occurrence of both
      (2L, "keep two")))          // boiler dropped, order preserved
  }

  test("dedupParagraphText emits empty string for an all-repeats doc") {
    val df = docs(1L -> "boiler\n\nplate", 2L -> "plate\n\nboiler")
    val out = PipelineOps.dedupParagraphText(df, "doc_id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "boiler\n\nplate"), (2L, "")))
  }

  test("dedupParagraphText: no exchange carries exploded paragraph text") {
    val df = docs(1L -> "a\n\nb", 2L -> "b\n\nc")
    val plan = PipelineOps.dedupParagraphText(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // keep-decision shuffles move (ph, id, idx) and (id, idx[]) only; the
    // sole text-bearing exchange is the final id-join moving each doc's
    // text intact, once
    plan.split("\n")
      .filter(l => l.contains("Exchange") || l.contains("Aggregate"))
      .foreach(l => assert(!l.contains("para#"),
        s"exploded paragraph text in a wide operator:\n$l"))
  }

  // -------------------------------------------------------- decontamination

  test("decontaminate counts distinct benchmark n-gram hits, zero for clean docs") {
    val s = spark
    import s.implicits._
    val corpus = docs(
      1L -> "the quick brown fox jumps",
      2L -> "totally clean document here now",
      3L -> "quick brown fox seen twice quick brown fox again")
    val bench = Seq("quick brown fox", "seen twice quick").toDF("ngram")
    val out = PipelineOps.decontaminate(corpus, "doc_id", "text", bench, n = 3)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq === Seq((1L, 1L, true), (2L, 0L, false), (3L, 2L, true)))
  }

  test("decontaminate broadcasts the benchmark side") {
    val s = spark
    import s.implicits._
    val corpus = docs(1L -> "a b c d")
    val bench = Seq("a b c").toDF("ngram")
    val plan = PipelineOps.decontaminate(corpus, "doc_id", "text", bench, n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark join should broadcast:\n$plan")
  }

  // ------------------------------------------------------- sequence packing

  test("packSequences: concat-and-chop boundaries, docs span sequences") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("doc_id", "n_tokens")
    val out = PipelineOps.packSequences(df, "doc_id", "n_tokens", seqLen = 256)
      .orderBy("doc_id")
      .select("doc_id", "tok_start", "seq_first", "seq_last", "n_seqs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 0L, 0L, 0L, 1L),     // tokens 0-99 in seq 0
      (2L, 100L, 0L, 1L, 2L),   // tokens 100-299 span seqs 0-1
      (3L, 300L, 1L, 2L, 2L)))  // tokens 300-599 span seqs 1-2
  }

  test("packSequences with shardCol packs per shard independently") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 300L), (2L, "a", 100L), (1L, "b", 50L), (2L, "b", 300L))
      .toDF("doc_id", "shard", "n_tokens")
    val out = PipelineOps.packSequences(df, "doc_id", "n_tokens",
        seqLen = 256, shardCol = Some("shard"))
      .orderBy("shard", "doc_id")
      .select("shard", "doc_id", "tok_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("a", 1L, 0L), ("a", 2L, 300L),
      ("b", 1L, 0L), ("b", 2L, 50L)))
  }

  // ---------------------------------------------------- URL canonicalization

  test("canonicalizeUrl: case, default port, fragment, tracking params") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // tracking-only query collapses entirely, default port stripped
      "HTTPS://WWW.Site.COM:443/A/B?utm_source=x&ref=1#frag" ->
        "https://www.site.com/A/B",
      // non-tracking params survive in order
      "http://Host.org:80/p?a=1&utm_medium=m&b=2" ->
        "http://host.org/p?a=1&b=2",
      // tracking param last leaves no dangling separator
      "https://x.io/p?id=4&ref=9" -> "https://x.io/p?id=4",
      // param names merely ENDING in 'ref' are not tracking params
      "http://h.io/p?href=abc&ref=1&xref=z" -> "http://h.io/p?href=abc&xref=z",
      // all params stripped leaves no lone '?'
      "http://h.io/p?ref=1" -> "http://h.io/p",
      // nothing to do
      "https://y.dev/clean" -> "https://y.dev/clean",
      // non-default port kept
      "https://z.net:8443/p" -> "https://z.net:8443/p")
    val df = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    val out = df.select(col("id"), PipelineOps.canonicalizeUrl(col("url")).as("c"))
      .orderBy("id").collect().map(_.getString(1))
    assert(out.toSeq === cases.map(_._2))
  }

  test("urlDomain lowercases and strips www") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "HTTPS://WWW.Example3.COM:443/p"),
                 (2L, "http://plain.org/x")).toDF("id", "url")
    val out = df.select(PipelineOps.urlDomain(col("url")))
      .orderBy("id").collect().map(_.getString(0))
    assert(out.toSeq === Seq("example3.com", "plain.org"))
  }

  // ------------------------------------------------------ repetition signals

  test("repetitionSignals: exact integer counts and fractions") {
    val df = docs(
      1L -> "a b a b a",      // bigrams: ab,ba,ab,ba -> 4 total, 2 distinct, top 2
      2L -> "x y z w",        // 3 distinct bigrams, no repeats
      3L -> "solo")           // no bigrams
    val out = PipelineOps.repetitionSignals(df, "doc_id", "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out(0) === ((1L, 4L, 2L, 2L, 0.5, 0.5)))
    assert(out(1) === ((2L, 3L, 3L, 1L, 0.0, 1.0 / 3.0)))
    assert(out(2) === ((3L, 0L, 0L, 0L, 0.0, 0.0)))
  }

  // ---------------------------------------------------------- PII redaction

  test("redactPii counts and redacts emails, phones, IPv4s") {
    val df = docs(
      1L -> "write bob.smith+x@mail-host.org or sue@a.io today",
      2L -> "call 555-123-4567 or 555-000-1111 from 10.0.3.44",
      3L -> "nothing sensitive here")
    val out = PipelineOps.redactPii(df, "doc_id", "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out(0) === ((1L, 2L, 0L, 0L, "write <EMAIL> or <EMAIL> today")))
    assert(out(1) === ((2L, 0L, 2L, 1L, "call <PHONE> or <PHONE> from <IP>")))
    assert(out(2) === ((3L, 0L, 0L, 0L, "nothing sensitive here")))
  }

  test("redactPii plan is shuffle-free") {
    val df = docs(1L -> "a@b.co")
    val plan = PipelineOps.redactPii(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }

  // ----------------------------------------------------- data-mix sampling

  test("deterministicSample is reproducible and rate-respecting") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) 10L else 90L))
      .toDF("doc_id", "rate")
    val out = PipelineOps.deterministicSample(df, "doc_id", col("rate"))
    val again = PipelineOps.deterministicSample(
        df.repartition(7), "doc_id", col("rate"))
      .orderBy("doc_id").select("sampled").collect().map(_.getBoolean(0))
    val first = out.orderBy("doc_id").select("sampled").collect().map(_.getBoolean(0))
    assert(first.toSeq === again.toSeq) // partitioning-independent
    val lowRate = out.where(col("rate") === 10 && col("sampled")).count()
    val highRate = out.where(col("rate") === 90 && col("sampled")).count()
    // (id*131+7) mod 100 is near-uniform over 500 ids per stratum
    assert(lowRate > 20 && lowRate < 80, s"10% stratum selected $lowRate of 500")
    assert(highRate > 420 && highRate < 480, s"90% stratum selected $highRate of 500")
  }

  // --------------------------------------------------- composite clean pass

  test("cleanCorpusStages: first-fail attribution, dedup sees only survivors") {
    val s = spark
    import s.implicits._
    // profiles: "en" wins when 'the' dominates, else "xx"
    val profiles = Seq("en" -> Seq("the"), "xx" -> Seq("zz"))
    val corpus = docs(
      1L -> "the quick brown fox jumps over it",   // kept
      2L -> "zz zz yy zz yy zz yy yy zz yy",       // fails lang AND repetition → labeled 1_lang
      3L -> "the quick brown fox jumps over it",   // exact dup of 1 → 4_exact_dup
      4L -> "the the the the the the the the")     // repetition fail
    val bench = Seq("no match here").toDF("ngram")
    val out = PipelineOps.cleanCorpusStages(corpus, "doc_id", "text", bench,
        profiles, Seq("the"), keepLang = "en", minQuality = 0.0,
        maxDupFrac = 0.5, n = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq(
      (1L, "6_kept"), (2L, "1_lang"), (3L, "4_exact_dup"), (4L, "3_repetition")))
  }

  test("cleanCorpusStages: a dup whose survivor-representative was filtered is kept") {
    val s = spark
    import s.implicits._
    val profiles = Seq("en" -> Seq("the"), "xx" -> Seq("zz"))
    // doc 1 and doc 5 share text BUT doc 1 fails repetition (dup bigrams);
    // doc 5 must then become its group's representative and be kept — the
    // dedup stage must run over survivors, not the raw corpus
    val rep = "the the the the the the"
    val corpus = docs(1L -> rep, 5L -> "the quick fox", 6L -> "the quick fox")
    val bench = Seq("no match here").toDF("ngram")
    val out = PipelineOps.cleanCorpusStages(corpus, "doc_id", "text", bench,
        profiles, Seq("the"), keepLang = "en", minQuality = 0.0,
        maxDupFrac = 0.3, n = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq(
      (1L, "3_repetition"), (5L, "6_kept"), (6L, "4_exact_dup")))
  }

  test("repetitionSignals plan is shuffle-free (doc-local)") {
    val df = docs(1L -> "a b c")
    val plan = PipelineOps.repetitionSignals(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }

  // -------------------------------------------------- latest-capture dedup

  test("latestCapture keeps the newest capture per canonical URL, id tiebreak") {
    val s = spark
    import s.implicits._
    val caps = Seq(
      // one canonical page captured three times (case/port/tracking differ)
      (1L, "https://a.com/p", 100L),
      (2L, "HTTPS://A.COM:443/p?utm_source=x", 300L),
      (3L, "https://a.com/p#frag", 200L),
      // equal timestamps → higher id wins
      (4L, "https://b.com/q", 500L),
      (5L, "https://b.com/q", 500L),
      // singleton
      (6L, "https://c.com/r", 50L)
    ).toDF("doc_id", "url", "ts")
    val out = PipelineOps.latestCapture(caps, "doc_id", "url", "ts")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      (1L, 3L, false), (2L, 3L, true), (3L, 3L, false),
      (4L, 2L, false), (5L, 2L, true),
      (6L, 1L, true)))
  }

  // ---------------------------------------------------- span-level dedup

  test("spanDedup removes duplicated spans except the globally-first occurrence") {
    // doc 1 and doc 2 share the 3-gram "x y z"; doc 1 is first → doc 2
    // loses those 3 tokens. doc 3 is untouched; doc 4 is shorter than k.
    val df = docs(
      1L -> "a b x y z c",
      2L -> "p q x y z r s",
      3L -> "unique tokens only here",
      4L -> "too short")
    val out = PipelineOps.spanDedup(df, "doc_id", "text", k = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 6L, 0L, "a b x y z c"),
      (2L, 7L, 3L, "p q r s"),
      (3L, 4L, 0L, "unique tokens only here"),
      (4L, 2L, 0L, "too short")))
  }

  test("spanDedup and latestCapture survive NULL text / NULL url rows") {
    val s = spark
    import s.implicits._
    val withNullText = Seq((1L, "a b c"), (2L, null: String))
      .toDF("doc_id", "text")
    val out = PipelineOps.spanDedup(withNullText, "doc_id", "text", k = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(3)))
    assert(out.toSeq === Seq((1L, 3L, false), (2L, 0L, true)))

    // a NULL url must still reach the decision table as its own group
    val caps = Seq((1L, "https://a.com/p", 10L), (2L, null: String, 20L),
                   (3L, null: String, 30L))
      .toDF("doc_id", "url", "ts")
    val dec = PipelineOps.latestCapture(caps, "doc_id", "url", "ts")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(dec.toSeq === Seq((1L, 1L, true), (2L, 1L, true), (3L, 1L, true)))
  }

  test("spanDedup merges overlapping self-repeats through token coverage") {
    // "a a a a a" with k=2: windows 0-3 all hash alike; survivor (1, 0)
    // keeps tokens 0-1, marks 1,2,3 cover tokens 1-4 → only token 0 kept
    val out = PipelineOps.spanDedup(docs(1L -> "a a a a a"), "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq((5L, 4L, "a")))
  }

  test("spanDedup matches a brute-force reference on random corpora") {
    val s = spark
    import s.implicits._
    // tiny vocab forces heavy window duplication, within and across docs
    val vocab = Array("a", "b", "c", "d", "e")
    val k = 3
    val rnd = new scala.util.Random(20260817L)
    (1 to 5).foreach { round =>
      val docs = (1L to 8L).map { id =>
        val n = rnd.nextInt(21) // includes docs shorter than k
        id -> Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      // brute-force: group windows by their TEXT, survivor = min (id, pos),
      // non-survivors cover [pos, pos+k)
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
      val occ = for { (id, ws) <- toks; i <- 0 to ws.length - k }
        yield (ws.slice(i, i + k).mkString(" "), id, i)
      val marks = occ.groupBy(_._1).values.filter(_.size >= 2)
        .flatMap(_.sortBy(o => (o._2, o._3)).tail.map(o => (o._2, o._3)))
        .toSeq.groupBy(_._1)
      val want = toks.map { case (id, ws) =>
        val covered = Array.fill(ws.length)(false)
        marks.getOrElse(id, Nil).foreach { case (_, p) =>
          (p until math.min(p + k, ws.length)).foreach(covered(_) = true) }
        id -> ((ws.length.toLong, covered.count(identity).toLong,
          ws.indices.filterNot(covered).map(ws).mkString(" ")))
      }.toMap
      val got = PipelineOps.spanDedup(docs.toDF("doc_id", "text"),
          "doc_id", "text", k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got === want, s"round $round: corpus $docs")
    }
  }

  // ----------------------------------------------- training-order shuffle

  test("trainingShuffle: permutation layout, repartition-invariant, seed-sensitive") {
    val s = spark
    import s.implicits._
    val df = (0L until 500L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val out = PipelineOps.trainingShuffle(df, "doc_id", numShards = 8, seed = "e0")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // every id appears exactly once
    assert(out.map(_._1).sorted.toSeq === (0L until 500L))
    // per shard, pos is a dense 1..n permutation
    out.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length),
        s"shard $sh pos not dense")
    }
    // shards balance within ±O(√(n/S)) of 500/8
    val sizes = out.groupBy(_._2).values.map(_.length)
    assert(sizes.size === 8 && sizes.forall(n => n > 30 && n < 95), sizes)
    // layout is a pure function of (id, seed): repartitioning cannot move it
    val again = PipelineOps.trainingShuffle(df.repartition(7), "doc_id",
        numShards = 8, seed = "e0")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // a new epoch (seed) is a genuinely different order
    val e1 = PipelineOps.trainingShuffle(df, "doc_id", numShards = 8, seed = "e1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(e1.sortBy(_._1).toSeq !== out.sortBy(_._1).toSeq)
  }

  test("trainingShuffle plan: one exchange, keyed on shard (sort stays local)") {
    val s = spark
    import s.implicits._
    val df = (0L until 50L).map(i => (i, "t")).toDF("doc_id", "text")
    val plan = PipelineOps.trainingShuffle(df, "doc_id", 4, "e0")
      .queryExecution.executedPlan.toString
    val exchanges = plan.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.length === 1 && exchanges.head.contains("shard#"), plan)
  }

  // ------------------------------------------------------------ domain cap

  test("capPerDomain matches the single-window reference on skewed random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42L)
    // zipf-ish: domain 0 holds ~half the rows (the mega-domain), plus ties
    val rows = (0L until 400L).map { id =>
      val dom = if (rnd.nextBoolean()) "mega.com" else s"d${rnd.nextInt(12)}.org"
      (id, dom, rnd.nextInt(20).toLong) // small range forces rank ties
    }
    val df = rows.toDF("doc_id", "domain", "n_chars")
    val got = PipelineOps.capPerDomain(df, "doc_id", "domain", "n_chars",
        k = 5, salts = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val want = rows.groupBy(_._2).flatMap { case (dom, rs) =>
      rs.sortBy(r => (-r._3, r._1)).take(5).zipWithIndex
        .map { case (r, i) => (r._1, dom, i + 1) }
    }.toSet
    assert(got === want)
  }

  test("capPerDomain is salt-count-invariant (including salts=1 single window)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val df = (0L until 200L).map(id => (id, s"d${rnd.nextInt(5)}", rnd.nextInt(9).toLong))
      .toDF("doc_id", "domain", "n_chars")
    val ref = PipelineOps.capPerDomain(df, "doc_id", "domain", "n_chars", 7, salts = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    Seq(2, 16, 64).foreach { salts =>
      val got = PipelineOps.capPerDomain(df, "doc_id", "domain", "n_chars", 7, salts)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(got === ref, s"salts=$salts diverged")
    }
  }

  // --------------------------------------------------- mixture upsampling

  test("upsampleMixture: whole + deterministic fractional copies, zero drops") {
    val s = spark
    import s.implicits._
    val df = (0L until 100L).map(i => (i, if (i < 50) "en" else "xx"))
      .toDF("doc_id", "lang")
    val out = PipelineOps.upsampleMixture(df, "doc_id",
        when(col("lang") === "en", 2500).otherwise(700))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byId = out.groupBy(_._1)
    byId.foreach { case (id, rows) =>
      val copies = rows.head._2
      val frac = if (id < 50) 500 else 700
      val whole = if (id < 50) 2 else 0
      val want = whole + (if ((id * 131 + 7) % 1000 < frac) 1 else 0)
      assert(copies === want, s"id $id")
      assert(rows.map(_._3).sorted.toSeq === (0 until copies), s"id $id copy ids")
    }
    // en stratum always emits (>= 2 copies); xx stratum only fractionally
    assert((0L until 50L).forall(byId.contains))
    val xxKept = (50L until 100L).count(byId.contains)
    assert(xxKept > 20 && xxKept < 50, s"~70% of xx expected, got $xxKept")
    // weight 1000 = exactly one copy, weight 0 = none
    val exact = PipelineOps.upsampleMixture(df, "doc_id", lit(1000))
    assert(exact.count() === 100 &&
      exact.select(max("copies")).head().getInt(0) === 1)
    assert(PipelineOps.upsampleMixture(df, "doc_id", lit(0)).count() === 0)
  }

  // --------------------------------------------------- linear quality model

  test("linearQualityScore: exact hashed-feature weight sums, shuffle-free") {
    def w(t: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(h.substring(0, 3), 16) % 2001L - 1000L
    }
    val df = docs(1L -> "alpha beta gamma", 2L -> "alpha", 3L -> "x y")
    val out = PipelineOps.linearQualityScore(df, "doc_id", "text")
    val got = out.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val s1 = w("alpha") + w("beta") + w("gamma")
    val s3 = w("x") + w("y")
    assert(got.toSeq === Seq(
      (1L, 3L, s1, if (s1 > 0) 1 else 0),
      (2L, 1L, w("alpha"), if (w("alpha") > 0) 1 else 0),
      (3L, 2L, s3, if (s3 > 0) 1 else 0)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must be narrow:\n$plan")
  }

  // ------------------------------------------------------ domain link graph

  test("domainLinkGraph aggregates anchors to (src, dst) domain edges") {
    val s = spark
    import s.implicits._
    val pages = Seq(
      (1L, "https://a.com/p1",
        """<p>x</p><a href="https://b.com/1">t</a><a href="https://B.COM/2">u</a>"""),
      (2L, "https://a.com/p2", """<a href="https://b.com/3">v</a> no more links"""),
      (3L, "https://c.org/q", """<a href="https://www.a.com/z">w</a>"""))
      .toDF("doc_id", "url", "html")
    val got = PipelineOps.domainLinkGraph(pages, "doc_id", "url", "html")
      .orderBy("src_domain", "dst_domain").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("a.com", "b.com", 3L, 2L),   // 2 anchors from page 1 + 1 from page 2
      ("c.org", "a.com", 1L, 1L)))  // www + case canonicalized away
  }

  test("spanDedup shuffles hashes and ids only — never document text") {
    val df = docs(1L -> "a b c d", 2L -> "a b c d")
    val plan = PipelineOps.spanDedup(df, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    // shuffles key on the window hash and the doc id only…
    assert(plan.contains("Exchange hashpartitioning(wh#"), plan)
    assert(plan.contains("Exchange hashpartitioning(id#"), plan)
    // …and no exchange or aggregate row ever carries the token array / text
    plan.split("\n")
      .filter(l => l.contains("Exchange") || l.contains("Aggregate"))
      .foreach(l => assert(!l.contains("ws#") && !l.contains("text#"),
        s"document text in a wide operator:\n$l"))
  }
}
