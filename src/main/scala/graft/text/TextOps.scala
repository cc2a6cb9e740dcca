package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Text-analysis and deduplication operators for large-scale training-data
  * pipelines over the web-page/document table.
  *
  * Scale design:
  *   - exact dedup groups by a 128-bit content hash — the text column itself
  *     is never shuffled (only hash + id move);
  *   - MinHash signatures are computed doc-locally (one pass per doc, no
  *     explode of shingles for signature building); only (band_key, id)
  *     pairs shuffle, and candidate verification joins fetch shingle sets
  *     for the candidate pairs only;
  *   - n-gram Jaccard's shingle self-join is the exact (quadratic-risk)
  *     path — kept for oracle verification and small corpora; LSH is the
  *     100 TB path.
  */
/** Exact-duplicate pre-collapse policy for the LSH dedup family
  * (minHashLshPairs / simhashPairs / embeddingNearDupPairs). Output is
  * identical across all three modes (MinHashSkewSpec); they trade probe
  * I/O against collapse machinery. */
sealed trait PreCollapse
object PreCollapse {
  /** ONE hash aggregate over the corpus decides whether the collapse
    * machinery pays for itself — right for mid-size corpora where
    * dup-freeness is plausible. Costs a full input pass. */
  case object Probe extends PreCollapse
  /** Always collapse, never probe — the crawl-scale setting: duplicates
    * are certain there, so the probe pass buys nothing and doubles input
    * I/O. */
  case object Assume extends PreCollapse
  /** Never collapse: pure lazy plan builder for corpora the caller
    * guarantees are already exact-deduped. */
  case object Off extends PreCollapse
}

object TextOps {

  // ------------------------------------------------------------ exact dedup

  /** Exact duplicate groups: (text_hash, rep_id = min id, dup_count).
    * Only hash+id shuffle; collision probability of md5 at web scale is
    * negligible and detectable downstream. */
  def exactDedupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("text_hash"), col(idCol))
      .groupBy("text_hash")
      .agg(min(idCol).as("rep_id"), count(lit(1)).as("dup_count"))

  /** Keep one representative row per distinct text (the min-id row). */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val reps = exactDedupGroups(df, idCol, textCol)
      .select(col("rep_id").as(idCol))
    df.join(reps, idCol)
  }

  // ------------------------------------------------------------ tokenizing

  def tokens(textCol: Column): Column = split(textCol, " ")

  def tokenCount(textCol: Column): Column = size(tokens(textCol))

  /** BPE-ish subword proxy: count of word-piece boundaries via a regex that
    * splits on transitions (letters/digits/punct) — a cheap deterministic
    * stand-in for tokenizer costs at scale. */
  def subwordCount(textCol: Column): Column =
    size(split(textCol, "(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])|\\s+|(?=[^a-z0-9\\s])"))

  // ------------------------------------------------------------ quality

  /** Quality-score components; all integer counts so downstream ratios are
    * deterministic across engines. */
  def stopwordCount(textCol: Column, stopwords: Seq[String]): Column = {
    val arr = tokens(textCol)
    size(filter(arr, t => t.isin(stopwords.map(lit): _*)))
  }

  /** Composite quality score ∈ [0,1]-ish: stopword-ratio band + mean word
    * length band (C4/Gopher-style heuristics, deterministic expression
    * tree). */
  def qualityScore(textCol: Column, nCharsCol: Column,
                   stopwords: Seq[String]): Column = {
    val nTok = tokenCount(textCol).cast("double")
    val stopRatio = stopwordCount(textCol, stopwords).cast("double") / nTok
    val meanLen = (nCharsCol.cast("double") - (nTok - 1)) / nTok
    lit(0.5) * stopRatio + lit(0.5) * (lit(1.0) - abs(meanLen - 5.0) / 10.0)
  }

  // ------------------------------------------------------------ language id

  /** Stopword-profile language ID: score = hits per profile, argmax with
    * first-profile tie-break. Profiles ordered — determinism matters.
    *
    * Implemented as `array_max` over (score, -position, lang) structs —
    * struct ordering is lexicographic, so the max is the highest score
    * with ties broken toward the FIRST profile. Each profile's score
    * subtree appears exactly ONCE; the earlier fold-of-whens formulation
    * embedded every prior score tree in each branch, growing the
    * expression exponentially in profile count (measured: multi-second
    * analysis/codegen once composed into larger plans). */
  def langId(textCol: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val entries = profiles.zipWithIndex.map { case ((lang, words), pos) =>
      struct(stopwordCount(textCol, words).as("score"),
        lit(-pos).as("negpos"), lit(lang).as("lang"))
    }
    array_max(array(entries: _*)).getField("lang")
  }

  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "he2", "zai4"))

  // ------------------------------------------------------------ fingerprints

  /** Content fingerprint: first 64 bits of md5 as hex — cross-engine
    * checkable. */
  def contentFingerprint(textCol: Column): Column =
    substring(md5(textCol), 1, 16)

  /** Winnowing fingerprint (rolling Karp–Rabin over char k-grams, window
    * minima — Schleimer et al.): local computation per doc, returns the
    * set of selected hash values. Engine-side only (not SQL-expressible). */
  def winnowFingerprintUdf(k: Int = 8, window: Int = 16) =
    udf((text: String) => TextHash.winnow(text, k, window))

  // ------------------------------------------------------------ shingles

  /** Distinct word n-gram shingle strings of a doc. */
  def shingleUdf(n: Int) = udf((text: String) => {
    val ws = text.split(" ", -1) // keep trailing empties: parity with Spark split + DuckDB string_split
    if (ws.length < n) Array.empty[String]
    else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" ")).distinct.toArray
  })

  /** EXACT n-gram Jaccard similar pairs (id_a < id_b, jac ≥ tau) via
    * prefix-filtered shingle self-join (PPJoin/Bayardo-style — exact, not
    * approximate):
    *
    *   1. shingles are 64-bit hashes (8-byte join keys; same hash family as
    *      the MinHash path, so both paths see identical sets);
    *   2. each doc's shingles are ordered GLOBALLY by (frequency asc, hash)
    *      and only the first |d| − ⌈τ·|d|⌉ + 1 form its prefix — two docs
    *      with jac ≥ τ MUST share a prefix shingle (pigeonhole), so joining
    *      prefixes finds every qualifying pair;
    *   3. hot shingles (stop-phrases shared by thousands of docs) sort LAST
    *      and fall out of prefixes — the Σc² candidate blowup of a naive
    *      shingle join collapses (62M → ~100k pair rows on the bench corpus);
    *   4. a size filter (τ·|b| ≤ |a|) prunes further; candidates verify
    *      exactly on their full hashed-shingle sets.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, tau: Double): DataFrame = {
    // persisted: consumed by the postings pass and twice by verification —
    // shingle-set construction is the per-doc CPU hotspot
    val prepared = df.select(col(idCol).as("id"),
        TextHash.shingleHashSetUdf(n)(col(textCol)).as("shs"))
      .where(size(col("shs")) > 0)
      .transform(graft.spark.PersistTracker.persist)
    ngramJaccardCandidates(prepared, tau, positional = true)
      .join(prepared.select(col("id").as("id_a"), col("shs").as("__sa")), "id_a")
      .join(prepared.select(col("id").as("id_b"), col("shs").as("__sb")), "id_b")
      .withColumn("jac", TextHash.jaccardVerifyUdf(col("__sa"), col("__sb")))
      .where(col("jac") >= tau)
      .select("id_a", "id_b", "jac")
      // tiny result, expensive plan: cache it so downstream consumers
      // (dedup components, repeated actions) don't re-run the self-join
      .transform(graft.spark.PersistTracker.persist)
  }

  /** Candidate pair generation for the exact path — prefix filter plus an
    * AGGREGATED positional filter (tightened this round): both docs'
    * shingle lists are sorted by the SAME global (frequency, hash) order,
    * so positions of common shingles are monotone in that order on both
    * sides, and for the LAST shared prefix shingle s* (ranks ra*, rb* —
    * each the max over shared rows, attained together by monotonicity):
    *
    *   every common shingle globally BEFORE s* has rank < ra* ≤ prefLen(a)
    *   and < rb* ≤ prefLen(b), hence lies in BOTH prefixes and is counted
    *   in opref; every common shingle AFTER s* has rank > ra* and > rb*,
    *   hence ≤ min(|a|−ra*, |b|−rb*) of them exist. So
    *
    *     o ≤ opref + min(|a|−ra*, |b|−rb*)
    *
    * and pairs whose bound misses o ≥ τ(|a|+|b|)/(1+τ) are pruned BEFORE
    * the shingle-set verification join (ε guards double rounding). This
    * replaces the earlier any-row first-shared bound + DISTINCT with one
    * grouped aggregate — strictly tighter pruning, same completeness (a
    * true pair's bound dominates its true overlap). */
  private[text] def ngramJaccardCandidates(prepared: DataFrame, tau: Double,
                                           positional: Boolean): DataFrame = {
    val postings = prepared.select(col("id"), size(col("shs")).as("sz"),
      explode(col("shs")).as("sh"))
    val freq = postings.groupBy("sh").agg(count(lit(1)).as("__c"))
    // prefix length |d| − ⌈τ·|d|⌉ + 1, shingles ranked rare-first.
    // Persisted: the self-join below would otherwise execute the whole
    // freq-join + per-doc window subtree TWICE (once per join side — the
    // dominant duplicated work in the executed plan before this round).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("__c", "sh")
    val prefixes = postings.join(freq, "sh")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("sz") - ceil(lit(tau) * col("sz")) + 1)
      .select("id", "sz", "sh", "__rn")
      .transform(graft.spark.PersistTracker.persist)
    val joined = prefixes.as("a").join(prefixes.as("b"), Seq("sh"))
      .where(col("a.id") < col("b.id") &&
        col("a.sz") >= lit(tau) * col("b.sz") &&
        col("b.sz") >= lit(tau) * col("a.sz"))
    if (!positional)
      joined.select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    else
      joined
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.sz").as("__sza"), col("b.sz").as("__szb"))
        .agg(count(lit(1)).as("__opref"),
          max(col("a.__rn")).as("__ra"), max(col("b.__rn")).as("__rb"))
        .where((col("__opref") +
            least(col("__sza") - col("__ra"), col("__szb") - col("__rb")))
          .cast("double") >=
          lit(tau / (1.0 + tau)) * (col("__sza") + col("__szb")) - lit(1e-9))
        .select("id_a", "id_b")
  }

  // -------------------------------------------------- dedup group canonical

  /** Connected components over near-dup pairs: each doc labeled with the
    * min id reachable through the pair graph — turning PAIRS into dedup
    * GROUPS (keep rep_id, drop the rest), the semantics a dedup pipeline
    * actually needs.
    *
    * Distributed min-label propagation: every pass joins labels across
    * edges and keeps the elementwise min; passes ≤ the max distance from a
    * node to its component's min. Near-dup components are dense and
    * shallow (dup clusters, not paths), so a handful of passes suffice;
    * every pass localCheckpoints so lineage stays flat (same discipline as
    * Knn). Edge and label tables only carry (id, id) longs — document text
    * never shuffles. */
  /** Bench probe: rounds the most recent CC invocation in this JVM took
    * (label-propagation passes, or star rounds when the star path ran).
    * Read by Bench so a fixture change that doubles convergence rounds is
    * visible in the bench line instead of hiding inside wall-clock. */
  val lastCcRounds = new java.util.concurrent.atomic.AtomicLong(-1L)

  def connectedComponents(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    // both edge directions from ONE pass over the (expensive) pair plan —
    // a union of two selects would execute the pair join twice
    val edges = pairs.select(explode(array(
        struct(col("id_a").as("u"), col("id_b").as("v")),
        struct(col("id_b").as("u"), col("id_a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("rep"))
      .localCheckpoint(true)
    var changed = 1L
    var pass = 0
    while (changed > 0 && pass < 50) {
      val nbr = edges.join(labels.select(col("id").as("v"), col("rep")), "v")
        .groupBy(col("u").as("id")).agg(min("rep").as("__nrep"))
      // old label carried through the checkpoint so the convergence test
      // is a narrow filter over the materialized pass — the previous
      // re-join of updated with labels cost one extra exchange per pass
      val updated = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("__nrep"), col("rep"))).as("rep"),
          col("rep").as("__old"))
        .localCheckpoint(true)
      changed = updated.where(col("rep") =!= col("__old")).count()
      labels = updated.select("id", "rep")
      pass += 1
    }
    lastCcRounds.set(pass.toLong)
    if (changed == 0)
      labels.select(col("id").as("doc_id"), col("rep").as("rep_id"))
    else
      // pathological long-chain topology: switch to the O(log n)-round
      // alternating star algorithm rather than truncate or fail
      connectedComponentsStar(nodes, pairs)
  }

  /** Alternating small-star / large-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond") — converges in
    * O(log n) ROUNDS on ANY topology, including the long chains that make
    * plain label propagation take O(diameter) passes:
    *
    *   large-star: every node points its STRICTLY LARGER neighbors at the
    *     minimum of its closed neighborhood;
    *   small-star: every node points its smaller-or-equal neighbors AND
    *     itself at that minimum.
    *
    * Each round is two (node)-keyed aggregations + joins over an edge set
    * that only ever carries (long, long) pairs; rounds end when the edge
    * set reaches a fixpoint (stars centered on component minima). */
  def connectedComponentsStar(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    // canonical directed edges child→parent, self-loops dropped
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
              least(col("id_a"), col("id_b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    def sym(e: DataFrame): DataFrame =
      e.select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))

    // m(u) = min of the closed neighborhood
    def mins(s: DataFrame): DataFrame =
      s.groupBy("u").agg(least(min("v"), first("u")).as("m"))

    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      s.join(mins(s), "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val withM = s.join(mins(s), "u")
      withM.where(col("v") <= col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(withM.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    def signature(e: DataFrame): (Long, Long) = {
      // xor aggregate: order-independent and cannot overflow under ANSI
      val r = e.agg(count(lit(1)),
          coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }

    var sig = signature(edges)
    var round = 0
    var stable = false
    while (!stable && round < 64) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nsig = signature(next)
      stable = nsig == sig
      sig = nsig
      edges = next
      round += 1
    }
    require(stable, s"connectedComponentsStar did not stabilize in $round rounds")
    lastCcRounds.set(round.toLong)
    nodes.select(col("id"))
      .join(edges.select(col("u").as("id"), col("v").as("__rep")), Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("__rep"), col("id")).as("rep_id"))
  }

  /** End-to-end near-dup GROUPS: exact n-gram Jaccard pairs (PPJoin+
    * filtered) → connected components → (doc_id, rep_id). */
  def dedupComponents(df: DataFrame, idCol: String, textCol: String,
                      n: Int, tau: Double): DataFrame =
    connectedComponents(df.select(col(idCol).as("id")),
      ngramJaccardPairs(df, idCol, textCol, n, tau))

  /** Expand representative-level near-dup pairs back over exact-duplicate
    * groups: cross pairs between two groups inherit the rep pair's
    * `payload` columns (identical texts ⇒ identical similarity); pairs
    * WITHIN a group are exact duplicates and carry `intraPayload`
    * (jac = 1.0 / hamming = 0 / nothing for candidate-only expansion).
    * `members` is (rep, member) — longs only, so every join here shuffles
    * ids, never documents. Shared by the MinHash, SimHash, and embedding
    * collapse paths. */
  private[graft] def expandMemberPairs(repPairs: DataFrame, members: DataFrame,
                                       payload: Seq[String],
                                       intraPayload: Seq[Column]): DataFrame = {
    val cross = repPairs
      .join(members.select(col("rep").as("id_a"), col("member").as("__ma")), "id_a")
      .join(members.select(col("rep").as("id_b"), col("member").as("__mb")), "id_b")
      .select(Seq(least(col("__ma"), col("__mb")).as("id_a"),
        greatest(col("__ma"), col("__mb")).as("id_b")) ++ payload.map(col): _*)
    val intra = members.as("x").join(members.as("y"), Seq("rep"))
      .where(col("x.member") < col("y.member"))
      .select(Seq(col("x.member").as("id_a"),
        col("y.member").as("id_b")) ++ intraPayload: _*)
    cross.unionByName(intra)
  }

  /** Cheap duplicate probe: ONE aggregate over content hashes (a guarded
    * driver action returning two longs). Decides whether the LSH paths
    * spend the exact-duplicate collapse machinery. */
  private[text] def hasExactDups(base: DataFrame): Boolean = {
    val r = base.select(md5(col("__text")).as("__th"))
      .agg(count(lit(1)), count_distinct(col("__th"))).collect()(0)
    r.getLong(0) != r.getLong(1)
  }

  // ------------------------------------------------------------ MinHash LSH

  /** Doc-local MinHash signature over hashed word n-gram shingles. */
  def minhashSigUdf(n: Int, numHashes: Int) = udf((text: String) =>
    TextHash.minhashSignature(text, n, numHashes))

  /** LSH band keys from a signature: one key per band = hash(band idx +
    * band's rows). */
  def bandKeysUdf(bands: Int, rows: Int) = udf((sig: Seq[Long]) =>
    TextHash.bandKeys(sig.toArray, bands, rows))

  /** Near-duplicate pairs via MinHash+LSH with exact Jaccard verification:
    * shingle→minhash→band→bucket-join→verify. Returns (id_a, id_b, jac)
    * with jac ≥ tau computed exactly on hashed shingle sets.
    *
    * Wide plan: docs → (sig, shingle-set hash array) map-side; bucket join
    * on band key; dedup pairs; verify by joining the two shingle arrays.
    * Only candidate pairs ever pay the verification cost.
    *
    * Skew hardening for web scale:
    *
    *   - `preDedupExact` (default PreCollapse.Probe — a cheap hash probe
    *     decides; Assume skips the probe for crawl-scale inputs where
    *     duplicates are certain, Off disables): EXACT duplicates are the dominant
    *     LSH hot-bucket cause at crawl scale (boilerplate pages repeated
    *     10^5-10^6×, identical signatures → every band collides → the
    *     self-join goes quadratic in the duplicate count). Identical texts
    *     collapse to their min-id representative BEFORE banding —
    *     signatures are computed once per distinct text, the bucket join
    *     runs over representatives, and member pairs expand back
    *     afterwards (intra-group pairs at jac = 1.0 exactly, cross-group
    *     pairs inherit the verified rep-pair jac). Output is IDENTICAL to
    *     the naive path (identical texts have identical sig/shs, so the
    *     rep candidate set equals the member candidate set collapsed).
    *   - `maxBucketSize`: optional fail-fast contract on the residual
    *     near-identical skew (10^5 docs differing by one token still
    *     collide on most bands). When set, the worst band bucket is
    *     counted before the self-join and the operator throws with a
    *     diagnostic instead of silently attempting a quadratic join.
    *
    * NOTE: the adaptive probe and the bucket guard are DRIVER ACTIONS at
    * call time — this operator (like all pair-join dedup) is batch-only;
    * pass preDedupExact = PreCollapse.Off, maxBucketSize = None for a
    * pure lazy plan-builder (Assume also stays lazy — only Probe acts). */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 64,
                      bands: Int = 16, tau: Double = 0.8,
                      preDedupExact: PreCollapse = PreCollapse.Probe,
                      maxBucketSize: Option[Long] = None): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val base = df.select(col(idCol).as("id"), col(textCol).as("__text"))

    // Probe: one cheap aggregate over 128-bit hashes decides whether the
    // collapse machinery (signature group-by + member expansion joins)
    // pays for itself — a dup-free corpus takes the direct path. Assume
    // skips the probe pass (crawl scale: dups certain). Off is the pure
    // lazy plan. Output is identical in all modes (MinHashSkewSpec).
    val anyDups = preDedupExact match {
      case PreCollapse.Off    => false
      case PreCollapse.Assume => true
      case PreCollapse.Probe  => hasExactDups(base)
    }

    // (rep-id keyed) doc set the banding runs over + member expansion map
    val (prepared, memberMap) =
      if (!anyDups) {
        (base.select(col("id"),
            minhashSigUdf(n, numHashes)(col("__text")).as("sig"),
            TextHash.shingleHashSetUdf(n)(col("__text")).as("shs"))
          .where(size(col("shs")) > 0)
          .transform(graft.spark.PersistTracker.persist), None)
      } else {
        // signatures are still computed map-side PER ROW (filtering to
        // representative rows first would shuffle the corpus text by id —
        // strictly worse than recomputing an embarrassingly-parallel
        // signature); what the collapse buys is everything AFTER the map:
        // the group-by keeps one (sig, shs) per distinct text, so the
        // band table, the quadratic-risk bucket self-join, and the
        // verification joins all run over representatives only
        val reps = base.select(md5(col("__text")).as("__th"), col("id"),
            minhashSigUdf(n, numHashes)(col("__text")).as("sig"),
            TextHash.shingleHashSetUdf(n)(col("__text")).as("shs"))
          .where(size(col("shs")) > 0)
          .groupBy("__th")
          .agg(min("id").as("id"), first("sig").as("sig"), first("shs").as("shs"))
          .transform(graft.spark.PersistTracker.persist)
        // (rep, member) pairs: md5 recomputed map-side on a second narrow
        // pass (cheaper than persisting text); only (hash, id) longs shuffle
        val thin = base.select(md5(col("__text")).as("__th"), col("id"))
        val members = thin
          .join(reps.select(col("__th"), col("id").as("rep")), "__th")
          .select(col("rep"), col("id").as("member"))
          .transform(graft.spark.PersistTracker.persist)
        (reps.drop("__th"), Some(members))
      }

    // persisted: consumed by the optional bucket guard AND both sides of
    // the candidate self-join (which would otherwise re-run the banding
    // projection per side)
    val bandsDf = prepared.select(col("id"),
        explode(bandKeysUdf(bands, rows)(col("sig"))).as("band_key"))
      .transform(graft.spark.PersistTracker.persist)
    maxBucketSize.foreach { cap =>
      // guarded driver action (tiny aggregate) — the fail-fast contract;
      // coalesce: max over an empty band table is NULL, not an error
      val worst = bandsDf.groupBy("band_key").agg(count(lit(1)).as("__c"))
        .agg(coalesce(max("__c"), lit(0L))).collect()(0).getLong(0)
      require(worst <= cap,
        s"LSH band bucket of size $worst exceeds maxBucketSize=$cap — the " +
          "candidate self-join would be quadratic in that bucket; raise " +
          "bands/rows, tighten shingling, or pre-filter the boilerplate")
    }
    val cands = bandsDf.as("a").join(bandsDf.as("b"), Seq("band_key"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val repPairs = cands
      .join(prepared.select(col("id").as("id_a"), col("shs").as("shs_a")), "id_a")
      .join(prepared.select(col("id").as("id_b"), col("shs").as("shs_b")), "id_b")
      .withColumn("jac", TextHash.jaccardVerifyUdf(col("shs_a"), col("shs_b")))
      .where(col("jac") >= tau)
      .select("id_a", "id_b", "jac")

    memberMap match {
      case None => repPairs
      case Some(members) =>
        // intra-group pairs are exact duplicates at jac = 1.0 exactly
        // (jaccard(s, s) = |s|/|s|)
        expandMemberPairs(repPairs, members,
          payload = Seq("jac"), intraPayload = Seq(lit(1.0).as("jac")))
    }
  }

  // ------------------------------------------------------------ SimHash

  def simhashUdf(n: Int) = udf((text: String) => TextHash.simhash(text, n))

  /** SimHash near-dup pairs: 64-bit fingerprint, candidates from matching
    * any of `tables` bit-slices (pigeonhole: hamming ≤ tables-1 guaranteed
    * caught), verified by exact hamming ≤ maxHamming.
    *
    * Candidate generation is provably COMPLETE for the verify threshold
    * only when `tables ≥ maxHamming + 1` (two fingerprints at hamming
    * ≤ maxHamming differ in ≤ tables-1 of the tables' disjoint bit
    * slices, so at least one slice matches) — enforced here; parity vs a
    * brute-force hamming join is asserted in SimhashParitySpec. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, maxHamming: Int = 3,
                   tables: Int = 4,
                   preDedupExact: PreCollapse = PreCollapse.Probe): DataFrame = {
    require(tables >= maxHamming + 1,
      s"tables ($tables) must be >= maxHamming+1 (${maxHamming + 1}) for complete recall")
    val base = df.select(col(idCol).as("id"), col(textCol).as("__text"))
    // identical texts have identical fingerprints → every slice collides →
    // the slice self-join is quadratic in the duplicate count. Same
    // hardening as minHashLshPairs (fingerprints still computed map-side
    // per row — the collapse shrinks the slice join, not the map): join
    // over representatives, expand members after (intra-group pairs are
    // exact duplicates at hamming 0). Output proven identical in
    // MinHashSkewSpec. Same tri-state probe knob: dup-free corpora skip
    // the collapse machinery entirely, crawl-scale callers skip the probe.
    val anyDups = preDedupExact match {
      case PreCollapse.Off    => false
      case PreCollapse.Assume => true
      case PreCollapse.Probe  => hasExactDups(base)
    }
    val (prepared, memberMap) =
      if (!anyDups)
        (base.select(col("id"), simhashUdf(n)(col("__text")).as("sh")), None)
      else {
        val reps = base.select(md5(col("__text")).as("__th"), col("id"),
            simhashUdf(n)(col("__text")).as("sh"))
          .groupBy("__th").agg(min("id").as("id"), first("sh").as("sh"))
          .transform(graft.spark.PersistTracker.persist)
        val thin = base.select(md5(col("__text")).as("__th"), col("id"))
        val members = thin
          .join(reps.select(col("__th"), col("id").as("rep")), "__th")
          .select(col("rep"), col("id").as("member"))
          .transform(graft.spark.PersistTracker.persist)
        (reps.drop("__th"), Some(members))
      }
    val sliceUdf = udf((h: Long) => TextHash.bitSlices(h, tables))
    // persisted: the slice self-join would otherwise run the fingerprint
    // subtree once per join side
    val sliced = prepared.select(col("id"), col("sh"),
        explode(sliceUdf(col("sh"))).as("slice_key"))
      .transform(graft.spark.PersistTracker.persist)
    // native codegen popcount (bit_count(xor)) instead of a Scala UDF:
    // single whole-stage-codegen evaluation, int-identical values
    val repPairs = sliced.as("a").join(sliced.as("b"), Seq("slice_key"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
    memberMap match {
      case None => repPairs
      case Some(members) =>
        expandMemberPairs(repPairs, members,
          payload = Seq("hamming"), intraPayload = Seq(lit(0).as("hamming")))
    }
  }
}
