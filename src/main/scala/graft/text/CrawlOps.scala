package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-corpus curation operators of the CCNet / CDX family: per-domain
  * boilerplate detection, capture-index (CDX/SURT) construction, and
  * inverted-index tf-idf retrieval. Reference semantics: the corpus-cleaning
  * stages a Common-Crawl-derived training pipeline runs between the raw
  * fetch (WARC, q85) and the clean-document table — the same role the
  * reference's filter/overlay stages play for spatial weights
  * (`/root/reference/src/vector_64bits/filter.c` applies per-layer
  * predicates before allocation; these apply per-domain predicates before
  * training).
  *
  * Oracle discipline (graft round-1 conventions): integer counts, md5 for
  * content identity, and identical expression chains on both engines.
  */
object CrawlOps {

  // ---------------------------------------------------- domain boilerplate

  /** CCNet-style per-domain boilerplate measurement: split every document
    * into non-overlapping `chunkTokens`-token chunks, hash each chunk, and
    * flag a chunk as boilerplate when the SAME chunk text occurs in at
    * least `minDocs` DISTINCT documents of the SAME domain (nav bars,
    * cookie banners, footers — template text repeated across a site but
    * not across the web). Returns one row per document:
    * `(id, n_chunks, n_boiler, boiler_pct)` with `boiler_pct` an exact
    * integer `100·n_boiler div n_chunks`.
    *
    * Scale: chunk hashes are computed MAP-SIDE (md5 before any exchange),
    * so the only shuffles move `(domain, chunk_hash, id)` triples — text
    * never leaves its scan partition. The (domain, hash) distinct-doc
    * count partial-aggregates; domains are bounded groups (a site's
    * template vocabulary, not its page count, drives the group size
    * because identical chunks collapse in the map-side combine). The
    * per-doc rollup joins flags back on (id, chunk_id) — ints only. */
  def boilerplateChunks(df: DataFrame, idCol: String, domainCol: String,
                        textCol: String, chunkTokens: Int,
                        minDocs: Int): DataFrame = {
    require(chunkTokens > 0 && minDocs > 1,
      s"need chunkTokens > 0, minDocs > 1; got $chunkTokens, $minDocs")
    val ct = chunkTokens
    val chunks = df
      .select(col(idCol).as("id"), col(domainCol).as("domain"),
        split(col(textCol), " ").as("toks"))
      .withColumn("n_chunks",
        expr("CAST((size(toks) + " + (ct - 1) + ") div " + ct + " AS BIGINT)"))
      .withColumn("chunk_id", explode(expr("sequence(0L, n_chunks - 1)")))
      .select(col("id"), col("domain"), col("n_chunks"), col("chunk_id"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("chunk_id") * ct + 1).cast("int"), lit(ct))))
          .as("h"))
      // two consumers below (threshold aggregate + per-doc rollup) — one
      // tokenize/hash pass, not two
      .localCheckpoint(true)
    val boiler = chunks
      .groupBy("domain", "h")
      .agg(countDistinct(col("id")).as("nd"))
      .where(col("nd") >= minDocs)
      .select(col("domain"), col("h"), lit(1L).as("is_boiler"))
    chunks
      .join(boiler, Seq("domain", "h"), "left")
      .groupBy("id", "n_chunks")
      .agg(sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
      .select(col("id"), col("n_chunks"), col("n_boiler"),
        expr("(100 * n_boiler) div n_chunks").as("boiler_pct"))
  }

  // ------------------------------------------------------------- CDX index

  /** CDX-style capture index over a multi-capture crawl: every (url, ts)
    * capture keyed by its SURT (Sort-friendly URI Reordering Transform —
    * host labels reversed and comma-joined, then the path), with the
    * content digest and the standard revisit classification: the FIRST
    * capture of a given (url, digest) is a `response` record, every later
    * byte-identical re-fetch is a `revisit` (the WARC/CDX dedupe model,
    * ISO 28500 §6.7). Sorting by (surt, ts) yields the CDX file order.
    *
    * Scale: digest is md5'd map-side; the one exchange keys on url and
    * carries (surt, ts, digest) — no page bytes. At web scale the CDX
    * build is a by-product of the WARC scan partition layout: captures of
    * one url land in one partition and the min-ts window never spills. */
  def cdxIndex(captures: DataFrame, urlCol: String, tsCol: String,
               textCol: String): DataFrame = {
    val host = regexp_extract(col(urlCol), "^https?://([^/]+)", 1)
    val path = regexp_extract(col(urlCol), "^https?://[^/]*(/.*)?$", 1)
    val keyed = captures.select(
      concat(array_join(reverse(split(host, "\\.")), ","), lit(")"), path)
        .as("surt"),
      col(urlCol).as("url"), col(tsCol).as("ts"),
      md5(col(textCol)).as("digest"))
    keyed
      .withColumn("first_ts",
        min(col("ts")).over(Window.partitionBy("url", "digest")))
      .select(col("surt"), col("ts"), col("digest"),
        when(col("ts") === col("first_ts"), "response")
          .otherwise("revisit").as("op"))
  }

  // ----------------------------------------------------- URL templates

  /** URL-template mining: collapse numeric path segments to `{d}` and
    * aggregate per (domain, template) — the crawl-frontier view that
    * exposes calendar traps, session-id explosions, and pagination
    * families (a template with millions of URLs but few distinct contents
    * is a trap; `dup_pct` = share of fetches that were repeat URLs).
    *
    * Scale: the template is a codegen'd regexp map; the aggregation keys
    * on (domain, template) — bounded by a site's ROUTE table, not its URL
    * count, so groups partial-aggregate to almost nothing map-side. */
  def urlTemplates(df: DataFrame, domainCol: String,
                   pathCol: String): DataFrame =
    df.select(col(domainCol).as("domain"),
        regexp_replace(col(pathCol), "[0-9]+", "{d}").as("template"),
        col(pathCol).as("__p"))
      .groupBy("domain", "template")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("__p")).as("n_distinct"))
      .withColumn("dup_pct",
        expr("(100 * (n_urls - n_distinct)) div n_urls"))

  // --------------------------------------------------------- phrase search

  /** Positional-postings phrase search: count exact phrase occurrences per
    * document by aligning the positional index — the anchor term's
    * postings joined to term k's postings on `(id, pos + k)`. The
    * classical inverted-index phrase algorithm (positional intersection),
    * expressed as equi-joins Catalyst can plan.
    *
    * Scale: the postings stream is filtered to the query's terms BEFORE
    * any join (a broadcast semi-join against the tiny term set), so the
    * positional joins move only the matching slivers — (id, pos) int
    * pairs keyed by (id, pos), never text. One phrase of k terms costs
    * k−1 sliver joins. */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
                   phrases: Seq[(Int, Seq[String])]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_._2.size >= 2),
      "phrases need at least two terms each")
    val pos = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
      .where(col("w").isin(phrases.flatMap(_._2).distinct: _*))
      .localCheckpoint(true)
    val perPhrase = phrases.map { case (qid, terms) =>
      val anchor = pos.where(col("w") === terms.head)
        .select(col("id"), col("pos"))
      terms.zipWithIndex.drop(1).foldLeft(anchor) { case (acc, (t, k)) =>
        acc.join(
          pos.where(col("w") === t)
            .select(col("id"), (col("pos") - k).as("pos")),
          Seq("id", "pos"))
      }
        .groupBy("id").agg(count(lit(1)).as("n_matches"))
        .select(lit(qid).as("qid"), col("id"), col("n_matches"))
    }
    perPhrase.reduce(_.unionByName(_))
  }

  // --------------------------------------------------- frontier expansion

  /** Crawl-frontier expansion: outlink targets of the crawled set that are
    * NOT yet crawled (left anti join on the capture table), deduplicated,
    * scored by in-link count, and politeness-capped to the top `k`
    * candidates per destination domain (two-phase: the exact count
    * aggregate bounds the group before the rank window).
    *
    * Scale: edges move as (target id, domain) pairs; the anti join keys on
    * the url id against the capture manifest's id column (at 10^12 pages
    * that side is the (id) projection of the manifest scan, not the
    * corpus). The per-domain rank is bounded by the candidate count of one
    * site — already capped by the in-link aggregation's map-side combine. */
  def frontierExpand(outlinks: DataFrame, tgtIdCol: String,
                     tgtDomainCol: String, crawled: DataFrame,
                     crawledIdCol: String, k: Int): DataFrame = {
    val cand = outlinks
      .select(col(tgtIdCol).as("id"), col(tgtDomainCol).as("domain"))
      .join(crawled.select(col(crawledIdCol).as("id")), Seq("id"), "left_anti")
      .groupBy("id", "domain").agg(count(lit(1)).as("n_inlinks"))
    cand
      .withColumn("rank", row_number().over(
        Window.partitionBy("domain")
          .orderBy(col("n_inlinks").desc, col("id"))))
      .where(col("rank") <= k)
      .select(col("domain"), col("rank").cast("int").as("rank"), col("id"),
        col("n_inlinks"))
  }

  // ------------------------------------------------ related-document top-k

  /** "More like this": for every probe document, the top `k` other
    * documents ranked by the integer tf-idf dot product
    * `Σ_terms tf_a·tf_b·idf_milli²` — the shared-term inverted-index plan
    * (two postings slivers joined on the term), with idf quantized ONCE
    * per term to milli-units so every pair score is exact integer
    * arithmetic (a cosine would need per-doc sqrt norms — the dot-product
    * form is what stays engine-exact, and the ranking it induces is the
    * standard unnormalized relevance).
    *
    * Scale: the probe side is a filtered sliver (broadcast); the corpus
    * postings shuffle once on the term; per-pair partial sums aggregate
    * map-side; the per-probe rank is the salted two-phase top-k. The idf
    * dimension is aggregated and broadcast as the PROBE-TERM sliver, never
    * the full vocabulary, and the `maxDf` stop-term cap is applied inside
    * that sliver before the postings meet the probe fan-out. */
  def relatedTopK(df: DataFrame, idCol: String, textCol: String,
                  probeIds: Seq[Long], k: Int,
                  maxDf: Long = Long.MaxValue, salts: Int = 16): DataFrame = {
    require(probeIds.nonEmpty && k > 0, "need probes and k > 0")
    val postings = df
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val n = postings.select(col("id")).distinct().count()
    val probes = postings.where(col("id").isin(probeIds: _*))
      .select(col("id").as("qid"), col("w"), col("tf").as("tf_q"))
    // idf over the PROBE-TERM SLIVER only: semi-join df's group-by input to
    // the (tiny, broadcast) probe term set so neither the aggregate nor the
    // broadcast ever carries the full vocabulary. The sliver dfreq (with
    // maxDf already applied) meets the corpus postings FIRST, so both the
    // probe-term restriction and the stop-term cap prune the posting
    // stream before the probe fan-out.
    val probeTerms = probes.select(col("w")).distinct()
    val dfreq = postings
      .join(broadcast(probeTerms), Seq("w"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
      .select(col("w"),
        round(log((lit(n) + 1.0) / (col("df") + lit(1L))) * 1e3, 0)
          .cast("long").as("idf_milli"))
    val order = Seq(col("score").desc, col("id").asc)
    postings
      .join(broadcast(dfreq), "w")
      .join(broadcast(probes), "w")
      .where(col("id") =!= col("qid"))
      .groupBy("qid", "id")
      .agg(sum(col("tf") * col("tf_q") * col("idf_milli") * col("idf_milli"))
        .as("score"))
      .withColumn("__salt", pmod(hash(col("id")), lit(salts)))
      .withColumn("__pr", row_number().over(
        Window.partitionBy("qid", "__salt").orderBy(order: _*)))
      .where(col("__pr") <= k)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(order: _*)))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("int").as("rank"), col("id"),
        col("score"))
  }

  // ------------------------------------------------- tf-idf top-k retrieval

  /** Inverted-index retrieval: score every document against each query (a
    * bag of terms) by `Σ_terms tf(t, d) · idf_micro(t)` where
    * `idf_micro(t) = round(ln((N + 1) / (df(t) + 1)) · 1e6)` — the
    * floating-point idf made engine-exact by the q79/q99 discipline (exact
    * integer operands, ONE double division, one `ln`, one round), after
    * which every score is exact integer arithmetic. Returns the top `k`
    * documents per query ranked by (score DESC, id ASC).
    *
    * Scale: postings `(term, id, tf)` partial-aggregate out of the
    * tokenize pass; document frequency is a second partial aggregate of
    * the POSTINGS (not the corpus). Query terms broadcast onto the
    * postings — the corpus-side exchange carries ints plus the term key,
    * and only terms that appear in some query survive the broadcast
    * semi-join before any wide work. The final rank uses the two-phase
    * salted top-k (a query IS a mega-group at crawl scale — its candidate
    * set is every matching document). */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
                queries: Seq[(Int, Seq[String])], k: Int,
                salts: Int = 16): DataFrame = {
    require(queries.nonEmpty && k > 0, "need queries and k > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val postings = df
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val n = postings.select(col("id")).distinct().count()
    val qterms = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "w")
    // document frequency is aggregated over the QUERY-TERM SLIVER of the
    // postings, never the full vocabulary: the semi-join against the tiny
    // broadcast query-term set happens BEFORE the df group-by, so both the
    // aggregate and the later broadcast carry |query terms| rows — at crawl
    // scale the vocabulary is billions of terms and is not broadcastable
    val qw = queries.flatMap(_._2).distinct.map(Tuple1(_)).toDF("w")
    val dfreq = postings.join(broadcast(qw), Seq("w"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("df"))
      .select(col("w"),
        round(log((lit(n) + 1.0) / (col("df") + lit(1L))) * 1e6, 0)
          .cast("long").as("idf_micro"))
    val order = Seq(col("score").desc, col("id").asc)
    postings
      .join(broadcast(qterms), "w")
      .join(broadcast(dfreq), "w")
      .groupBy("qid", "id")
      .agg(sum(col("tf") * col("idf_micro")).as("score"))
      .withColumn("__salt", pmod(hash(col("id")), lit(salts)))
      .withColumn("__pr", row_number().over(
        Window.partitionBy("qid", "__salt").orderBy(order: _*)))
      .where(col("__pr") <= k)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(order: _*)))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("int").as("rank"), col("id"),
        col("score"))
  }

  // ---------------------------------------------------- BM25 top-k retrieval

  /** Okapi BM25 retrieval (k1 = 1.2, b = 0.75) in EXACT integer
    * arithmetic: per (query, doc) the term score
    *
    *   idf·tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *
    * is evaluated as `(idf_micro·22·A·tf) div (10·A·tf + 3·A + 9·dl·N)` —
    * the rational k1/b constants and avgdl = A/N cleared to one integer
    * numerator/denominator pair (A = Σ doc lengths, N = doc count), so
    * scores are bit-exact on any engine. The one float op is the idf,
    * quantized once per query term to micro-nats:
    * `round(ln(1 + (N−df+0.5)/(df+0.5))·1e6)` (the "+1" Lucene form keeps
    * it positive). Returns the top k docs per query by (score DESC, id).
    *
    * Scale: same shape as tfidfTopK — postings partial-aggregate out of
    * the tokenize pass; df is aggregated over the QUERY-TERM SLIVER (semi
    * join against the broadcast term set before the group-by, never the
    * full vocabulary); doc lengths join candidates on the id key; the
    * final rank is the salted two-phase top-k. The cleared-denominator
    * products stay well under 2^63 while idf_micro·22·A·tf_max < 2^63 —
    * beyond that (A ≳ 10^12 tokens) a production deployment quantizes
    * dl/avgdl once per doc instead; the contract require()s the bound. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, Seq[String])], k: Int,
               salts: Int = 16): DataFrame = {
    require(queries.nonEmpty && k > 0, "need queries and k > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val postings = df
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("id", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val lens = postings.groupBy("id").agg(sum("tf").as("dl"))
      .localCheckpoint(true)
    // the three corpus scalars (doc count, token count, max tf) in ONE
    // guarded driver aggregate over the checkpointed postings — n(docs) =
    // distinct posting ids = lens row count, a = Σtf = Σdl
    val g = postings.agg(count_distinct(col("id")).as("n"),
      sum("tf").as("a"), max("tf").as("m")).head()
    val n = g.getLong(0)
    require(n > 0, "BM25 needs a non-empty corpus")
    val a = g.getLong(1)
    val maxTf = 1L max g.getLong(2)
    require(BigInt(22) * a * maxTf * 15000000L < BigInt(Long.MaxValue),
      s"cleared BM25 denominators overflow long at A=$a tokens — " +
        "quantize dl/avgdl per doc at this scale")
    val qterms = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "w")
    val qw = queries.flatMap(_._2).distinct.map(Tuple1(_)).toDF("w")
    val dfreq = postings.join(broadcast(qw), Seq("w"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("df"))
      .select(col("w"),
        round(log(lit(1.0) +
            (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) * 1e6, 0)
          .cast("long").as("idf_micro"))
    val order = Seq(col("score").desc, col("id").asc)
    postings
      .join(broadcast(qterms), "w")
      .join(broadcast(dfreq), "w")
      .join(lens, "id")
      .select(col("qid"), col("id"), expr(
        s"(idf_micro * 22L * ${a}L * tf) div " +
          s"(10L * ${a}L * tf + 3L * ${a}L + 9L * dl * ${n}L)").as("tsc"))
      .groupBy("qid", "id").agg(sum("tsc").as("score"))
      .withColumn("__salt", pmod(hash(col("id")), lit(salts)))
      .withColumn("__pr", row_number().over(
        Window.partitionBy("qid", "__salt").orderBy(order: _*)))
      .where(col("__pr") <= k)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(order: _*)))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("int").as("rank"), col("id"),
        col("score"))
  }
}
