package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model quality scoring: train a unigram LM
  * with add-one smoothing on a reference split of the corpus, score every
  * document by its average negative log-likelihood, and bucket into
  * head / middle / tail (the CCNet perplexity-bucket recipe, Wenzek et al.
  * 2020 — public method).
  *
  * Numeric discipline: per-TOKEN-TYPE scores are quantized ONCE to integer
  * micro-nats (round(-ln(p)·1e6) as BIGINT), so every per-document
  * aggregate is an exact integer sum — order-independent across engines
  * and partitionings, which is what lets a DuckDB oracle match the Spark
  * result bit-for-bit (the only float op happens once per vocabulary type,
  * where a 1-ulp libm divergence would need to land exactly on a .5
  * micro-nat boundary to matter).
  *
  * Scale: the LM is a (token → count) table — vocabulary-sized, not
  * corpus-sized. Scoring is explode + hash join on the token + per-doc
  * partial-aggregated sum; the document text never shuffles. At 100 TB the
  * vocab table exceeds broadcast range → the join shuffles tokens (8-byte
  * hash + id would be the slimmer key; kept as the string join here for
  * oracle parity). Bucketing by global ntile is a single-partition window —
  * fine for reports; production pipelines freeze fixed thresholds from a
  * sampled quantile job instead (`bucketByThresholds`). */
object NgramLm {

  /** (w, unll) micro-nat score per vocabulary type, plus the OOV score.
    * denom = N + V (add-one smoothing over N train tokens, V types). */
  def trainUnigram(train: DataFrame, textCol: String): (DataFrame, Long) = {
    val tok = train.select(explode(split(col(textCol), " ")).as("w"))
    val counts = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .transform(graft.spark.PersistTracker.persist)
    val firstRow = counts.agg(sum("c").as("n"), count(lit(1)).as("v")).head()
    require(!firstRow.isNullAt(0) && firstRow.getLong(1) > 0,
      "training split is empty — the LM needs at least one document")
    val denom = (firstRow.getLong(0) + firstRow.getLong(1)).toDouble
    val lm = counts.select(col("w"),
      round(-log((col("c") + lit(1.0)) / lit(denom)) * lit(1e6), 0)
        .cast("long").as("unll"))
    val oov = math.round(-math.log(1.0 / denom) * 1e6)
    (lm, oov)
  }

  /** Score docs under the LM: (id, n_tokens, sum_unll, avg_unll) with
    * avg_unll = sum_unll div n_tokens (exact integer division). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            lm: DataFrame, oovUnll: Long): DataFrame =
    docs.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("w"))
      .join(lm, Seq("w"), "left")
      .select(col("id"), coalesce(col("unll"), lit(oovUnll)).as("unll"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("unll").as("sum_unll"))
      .withColumn("avg_unll", expr("sum_unll div n_tokens"))

  /** head/middle/tail via global tertiles (deterministic total order).
    *
    * Scale-safe form of `ntile(3) OVER (ORDER BY avg_unll, id)` — the
    * round-5 verdict's flagged corpus-sized single-partition sort. The
    * global rank decomposes as
    *   rank = (#docs with smaller avg_unll) + (rank by id within the tie)
    * so it computes from (a) the VALUE-HISTOGRAM cumulative counts — the
    * only empty-partition window, bounded by the distinct micro-nat
    * values, never the corpus — and (b) a per-value grouped window. The
    * bucket then applies SQL ntile's exact sizing (first n mod 3 buckets
    * get one extra row), making the output BIT-IDENTICAL to the ntile
    * form on any multiset — certified against it in PerplexityCutSpec. */
  def bucketNtile(scored: DataFrame): DataFrame = {
    // input persisted: consumed by the histogram aggregate and the ranked
    // projection below
    val in = graft.spark.PersistTracker.persist(scored)
    // histogram + cumulative counts + grand total in ONE pass over the
    // (value-bounded) distinct-value table — both windows run over the
    // histogram, never the corpus
    val hist = in.groupBy("avg_unll").agg(count(lit(1)).as("__c"))
      .withColumn("__cumBefore",
        coalesce(sum("__c").over(Window.orderBy("avg_unll")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum("__c").over(
        Window.orderBy("avg_unll").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("avg_unll", "__cumBefore", "__n")
    in
      .withColumn("__rid", row_number().over(
        Window.partitionBy("avg_unll").orderBy("id")))
      .join(hist, "avg_unll")
      .withColumn("__r", col("__cumBefore") + col("__rid"))
      .withColumn("ppl_bucket", expr(
        """CASE WHEN __r <= (__n % 3) * (__n div 3 + 1)
          |     THEN CAST((__r - 1) div (__n div 3 + 1) + 1 AS INT)
          |     ELSE CAST(__n % 3 +
          |       (__r - (__n % 3) * (__n div 3 + 1) - 1)
          |         div greatest(__n div 3, 1L) + 1 AS INT)
          |END""".stripMargin))
      .drop("__rid", "__cumBefore", "__n", "__r")
  }

  /** Fixed-threshold bucketing — the form that survives 100 TB (thresholds
    * frozen from a sampled quantile job; no global window anywhere). */
  def bucketByThresholds(scored: DataFrame, t1: Long, t2: Long): DataFrame = {
    require(t1 <= t2, s"thresholds out of order: $t1 > $t2")
    scored.withColumn("ppl_bucket",
      when(col("avg_unll") < t1, lit(1))
        .when(col("avg_unll") < t2, lit(2)).otherwise(lit(3)))
  }

  // ----------------------------------------------- interpolated bigram LM

  /** Bigram LM state: per-pair and per-word counts plus the add-one
    * denominator `d = N + V` from the training split. */
  final case class BigramLm(pairs: DataFrame, unigrams: DataFrame, d: Long)

  /** Train the Jelinek-Mercer-interpolated bigram model: raw bigram counts
    * c12(w1,w2), raw unigram counts c(w), and the add-one denominator.
    * The model ITSELF is two count tables — vocabulary- and pair-typed,
    * not corpus-sized (the standard LM artifact shape). */
  def trainBigram(train: DataFrame, textCol: String): BigramLm = {
    // adjacent pairs are DOC-LOCAL (one transform over the token array):
    // the earlier posexplode + per-doc lead() window shuffled and sorted
    // the whole token table just to look one element ahead
    val base = train.select(split(col(textCol), " ").as("ws"))
      .transform(graft.spark.PersistTracker.persist) // unigrams + pairs
    val uni = base.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .transform(graft.spark.PersistTracker.persist)
    val nv = uni.agg(sum("c").as("n"), count(lit(1)).as("v")).head()
    require(!nv.isNullAt(0) && nv.getLong(1) > 0,
      "training split is empty — the LM needs at least one document")
    val pairs = base
      // sequence(1, 0) would DESCEND on a one-token doc — guard to empty
      .select(explode(expr(
        """case when size(ws) >= 2 then
          |  transform(sequence(1, size(ws) - 1),
          |    i -> struct(ws[i - 1] AS w1, ws[i] AS w2))
          |else array() end""".stripMargin)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("c12"))
    val d = nv.getLong(0) + nv.getLong(1)
    // bit-exactness contract: every score-side operand must be exactly
    // representable as a double (< 2^53). The worst case is the arm-3
    // numerator 7·c12·d + 3·c1·(c2+1) ≤ 10·N·d and the denominator
    // 10·c1·d ≤ 10·N·d — guard on the full factor 10, not the leading 7,
    // or corpora in the (2^53/10, 2^53/7) band would pass the guard and
    // silently lose ulps. At larger corpora train on a sample.
    require(10.0 * nv.getLong(0) * d < (1L << 53).toDouble,
      s"bigram LM operands would exceed 2^53 (N=${nv.getLong(0)}, d=$d) — " +
        "train on a sample to keep scores engine-exact")
    BigramLm(pairs, uni, d)
  }

  /** Score documents under the interpolated bigram model
    * `p(w2|w1) = 0.7·c12/c1 + 0.3·(c2+1)/d`, with the two backoff tiers a
    * crawl corpus forces (unseen context → unigram; seen context, unseen
    * pair → the interpolation's unigram share alone):
    *
    *   - first token / unseen w1 : p = (c2 + 1) / d
    *   - seen w1, unseen (w1,w2) : p = 3·(c2 + 1) / (10·d)
    *   - seen pair               : p = (7·c12·d + 3·c1·(c2 + 1)) / (10·c1·d)
    *
    * Every numerator/denominator is an EXACT integer (< 2^53), evaluated
    * in ONE double division + one `ln` + one round per token — the q79/q99
    * bit-exactness discipline extended to a conditional three-arm model.
    * Returns (id, n_tokens, sum_unll, avg_unll) in integer micro-nats.
    *
    * Scale: the pair join shuffles (w1, w2, id-local ints); unigram joins
    * broadcast (vocabulary-sized). Document text never leaves its scan
    * partition — only the token stream moves. */
  def scoreBigram(docs: DataFrame, idCol: String, textCol: String,
                  lm: BigramLm): DataFrame = {
    val d = lm.d
    // (prev, cur) token pairs computed DOC-LOCALLY — the earlier
    // posexplode + per-doc lag() window paid an exchange and a sort for a
    // one-element look-back; first token's w1 stays NULL exactly as lag's
    val tok = docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("ws"))
      .select(col("id"), explode(expr(
        """transform(sequence(0, size(ws) - 1),
          |  i -> struct(CASE WHEN i = 0 THEN CAST(NULL AS STRING)
          |                   ELSE ws[i - 1] END AS w1,
          |              ws[i] AS w2))""".stripMargin)).as("t"))
      .select(col("id"), col("t.w1").as("w1"), col("t.w2").as("w2"))
    val c1t = broadcast(lm.unigrams.select(col("w").as("w1"), col("c").as("c1")))
    val c2t = broadcast(lm.unigrams.select(col("w").as("w2"), col("c").as("c2")))
    tok
      .join(c1t, Seq("w1"), "left")
      .join(c2t, Seq("w2"), "left")
      .join(lm.pairs, Seq("w1", "w2"), "left")
      .withColumn("__c2", coalesce(col("c2"), lit(0L)))
      .withColumn("__p",
        when(col("w1").isNull || col("c1").isNull,
          (col("__c2") + lit(1L)) / lit(d))
        .when(col("c12").isNull,
          (lit(3L) * (col("__c2") + lit(1L))) / lit(10L * d))
        .otherwise(
          (lit(7L) * col("c12") * lit(d) +
            lit(3L) * col("c1") * (col("__c2") + lit(1L))) /
          (lit(10L) * col("c1") * lit(d))))
      .select(col("id"),
        round(-log(col("__p")) * 1e6, 0).cast("long").as("unll"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("unll").as("sum_unll"))
      .withColumn("avg_unll", expr("sum_unll div n_tokens"))
  }
}
