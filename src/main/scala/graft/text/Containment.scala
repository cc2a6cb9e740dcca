package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Asymmetric containment dedup: |shingles(A) ∩ shingles(B)| / |shingles(A)|
  * over word n-grams — the clone/subsumption detector Jaccard misses (a
  * paragraph quoted inside a 10× longer page has low Jaccard but
  * containment ≈ 1, and the SHORTER side is the one a dedup pass drops).
  *
  * Plan (rebuilt in the optimization round): the original inverted-index
  * self-join generated Σ c² candidate ROWS per shingle frequency c — the
  * bench corpus produced ~16M pair rows for ~6k qualifying pairs. The
  * containment test o ≥ ⌈τ·|A|⌉ admits the standard PREFIX-FILTER
  * pigeonhole (PPJoin discipline, guide §3.2 "reduce the big side before
  * shuffling it"): order every doc's shingles by a GLOBAL (frequency asc,
  * hash) rank; if none of A's first |A| − ⌈τ|A|⌉ + 1 shingles is shared
  * with B, at most ⌈τ|A|⌉ − 1 shingles can be shared, so the pair cannot
  * qualify. Candidates therefore come from prefix(θ-defining side) ⋈ FULL
  * postings — frequency ordering pushes boilerplate shingles out of every
  * prefix, which is exactly what kills the Σ c² blowup — and each
  * candidate pair is verified EXACTLY by one merge-intersect over the two
  * sorted hashed-shingle sets. Shingles are the 64-bit span hashes of the
  * MinHash/PPJoin family (8-byte keys, no gram strings materialize);
  * overlap counts of hashes equal the string counts modulo the
  * documented-negligible collision class, bit-verified against the
  * string-side DuckDB oracle at every SF. */
object Containment {

  /** Ordered pairs (id_a, id_b, cont_milli) with
    * cont_milli = 1000·shared div |shingles(a)| ≥ tauMilli. Word n-grams
    * (default trigrams); docs with fewer than n tokens have no shingles
    * and never appear. `maxDf` (when bounded) drops shingles appearing in
    * more than that many docs BEFORE pairing — a dropped shingle can only
    * LOWER a containment estimate, and boilerplate is exactly what
    * containment should not score on; that pruned variant keeps the
    * direct inverted-index join (the df cap already bounds its blowup). */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, tauMilli: Int = 800,
                       maxDf: Long = Long.MaxValue): DataFrame = {
    require(n >= 1 && tauMilli >= 0, s"bad n=$n tauMilli=$tauMilli")
    if (maxDf != Long.MaxValue)
      containmentPairsPruned(docs, idCol, textCol, n, tauMilli, maxDf)
    else {
      // one row per doc: sorted distinct 64-bit shingle hashes; persisted —
      // consumed by candidate generation and twice by verification
      val sets = docs
        .select(col(idCol).as("id"),
          TextHash.shingleHashSetUdf(n)(col(textCol)).as("shs"))
        .where(size(col("shs")) > 0)
        .transform(graft.spark.PersistTracker.persist)
      val verified = candidatePairs(sets, tauMilli)
        .join(sets.select(col("id").as("id_a"), col("shs").as("__sa")), "id_a")
        .join(sets.select(col("id").as("id_b"), col("shs").as("__sb")), "id_b")
        .withColumn("m", TextHash.overlapVerifyUdf(col("__sa"), col("__sb")))
        .select(col("id_a"), col("id_b"), col("m"),
          size(col("__sa")).as("sa"), size(col("__sb")).as("sb"))
        .where(col("m") > 0) // the original inner join implied shared ≥ 1
      // both ordered directions fall out of one unordered verify
      verified
        .select(col("id_a"), col("id_b"),
          expr("(1000 * cast(m as bigint)) div sa").as("cont_milli"))
        .unionByName(verified.select(col("id_b").as("id_a"),
          col("id_a").as("id_b"),
          expr("(1000 * cast(m as bigint)) div sb").as("cont_milli")))
        .where(col("cont_milli") >= tauMilli)
    }
  }

  /** UNORDERED candidate pairs (id_a < id_b) that can possibly satisfy
    * overlap ≥ ⌈tauMilli·|side|/1000⌉ for at least one side: prefix filter
    * with global (doc-frequency asc, hash) ranking — complete by the
    * pigeonhole argument in the header; exact verification is the
    * caller's. `sets` must be (id, shs sorted distinct hashes). Shared by
    * the containment score (q156) and the reuse-direction audit (q281). */
  private[graft] def candidatePairs(sets: DataFrame,
                                    tauMilli: Int): DataFrame = {
    val postings = sets.select(col("id"), size(col("shs")).as("sz"),
      explode(col("shs")).as("sh"))
    val freq = postings.groupBy("sh").agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("__c", "sh")
    // every posting carries its global (freq asc, hash) rank within its
    // doc; persisted — the prefix slice and the full probe side both read
    // it, and the positional bound below needs full-side ranks too
    val ranked = postings.join(freq, "sh")
      .withColumn("__rn", row_number().over(w))
      .select("id", "sz", "sh", "__rn")
      .transform(graft.spark.PersistTracker.persist)
    // θ = ⌈τ·sz⌉ in exact integer arithmetic; prefix = first sz − θ + 1
    val prefixes = ranked
      .where(col("__rn") <=
        col("sz") - expr(s"($tauMilli * sz + 999) div 1000") + 1)
      .select(col("id").as("__pid"), col("sz").as("__psz"),
        col("sh"), col("__rn").as("__prn"))
    // aggregated positional bound (see TextOps.ngramJaccardCandidates for
    // the monotone-rank proof; it holds for prefix×full orientations too):
    //   o ≤ opref + min(szp − rp*, szf − rf*)
    // tested against the PREFIX side's own θ in exact integers — the side
    // whose containment the orientation covers
    ranked.select(col("id").as("__fid"), col("sz").as("__fsz"),
        col("sh"), col("__rn").as("__frn"))
      .join(prefixes, "sh")
      .where(col("__fid") =!= col("__pid"))
      .groupBy(col("__pid"), col("__fid"), col("__psz"), col("__fsz"))
      .agg(count(lit(1)).as("__opref"),
        max(col("__prn")).as("__rp"), max(col("__frn")).as("__rf"))
      .where(col("__opref") +
        least(col("__psz") - col("__rp"), col("__fsz") - col("__rf")) >=
        expr(s"($tauMilli * __psz + 999) div 1000"))
      .select(least(col("__fid"), col("__pid")).as("id_a"),
        greatest(col("__fid"), col("__pid")).as("id_b"))
      .distinct()
  }

  /** The pre-round direct inverted-index formulation, kept for the
    * hot-shingle-pruned variant (maxDf caps the blowup by construction,
    * and pruning must also drop the shingle from the COUNTS — which the
    * array verify above deliberately does not). */
  private def containmentPairsPruned(docs: DataFrame, idCol: String,
                                     textCol: String, n: Int, tauMilli: Int,
                                     maxDf: Long): DataFrame = {
    val idx = (0 until n).map(i => s"toks[i + $i]").mkString(", ")
    val shingles = docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("id"), explode(expr(
        s"array_distinct(transform(sequence(0, size(toks) - $n), " +
          s"i -> concat_ws(' ', $idx)))")).as("sh"))
      .transform(graft.spark.PersistTracker.persist) // sizes + join below
    val hot = shingles.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("sh")
    val pruned = shingles.join(broadcast(hot), Seq("sh"), "left_anti")
    val sizes = shingles.groupBy("id").agg(count(lit(1)).as("sa"))
    pruned.alias("x")
      .join(pruned.alias("y"),
        col("x.sh") === col("y.sh") && col("x.id") =!= col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.withColumnRenamed("id", "id_a"), "id_a")
      .select(col("id_a"), col("id_b"),
        expr("(1000 * shared) div sa").as("cont_milli"))
      .where(col("cont_milli") >= tauMilli)
  }
}
