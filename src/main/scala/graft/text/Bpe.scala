package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016) as a
  * dictionary-sized Spark job — the missing piece between the corpus and
  * the sequence-packing/token-count operators, which all presuppose a
  * trained subword vocabulary.
  *
  * The classic trainer is a loop over the corpus; the distributed
  * formulation is a loop over the WORD DICTIONARY: one corpus pass builds
  * `(word, freq)` (vocabulary-sized — millions of rows at 100 TB, not
  * trillions), and every merge round after that touches only the dict:
  * one keyed aggregation for weighted pair counts, one 1-row driver
  * aggregate for the winning pair (the merge decision is a scalar — the
  * guarded-collect contract of the probe/dimension operators), and one
  * codegen'd map to apply the merge. Nothing per-round is proportional to
  * the corpus.
  *
  * Determinism: the winning pair is `(count DESC, left ASC, right ASC)` —
  * a total order — and merge application is the exact greedy
  * left-to-right non-overlapping scan of the original formulation,
  * expressed as an `aggregate()` fold over the symbol array (pure
  * per-row codegen, no shuffle). The fold is equivalent to the greedy
  * scan because a merged token `left+right` can never equal `left`
  * (that would need an empty `right`), so a token produced this round
  * can never seed a second merge this round (BpeSpec property-gates the
  * fold against a plain-Scala greedy reference, including `l = r` runs
  * where naive string replace diverges).
  */
object Bpe {

  final case class Merge(round: Int, lsym: String, rsym: String,
                         pairCount: Long, tokensAfter: Long)

  /** One corpus pass → `(w, freq)` word dictionary. Words are restricted
    * to `[a-z]{2,20}` so symbols stay regex/SQL-literal-safe; real
    * trainers normalize similarly before counting. */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w").rlike("^[a-z]{2,20}$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence: the word's characters, space-joined. */
  def initSymbols(dict: DataFrame): DataFrame =
    dict.withColumn("syms", trim(regexp_replace(col("w"), "(.)", "$1 ")))
      .select("w", "freq", "syms")

  /** Frequency-weighted adjacent-pair counts over the dict — the only
    * shuffle a merge round pays, and it shuffles pair strings, never
    * words. */
  def pairCounts(dict: DataFrame): DataFrame =
    dict.select(col("freq"), split(col("syms"), " ").as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(slice(ws, 1, size(ws) - 1), " +
          "(x, i) -> struct(x AS ls, element_at(ws, i + 2) AS rs))")).as("p"))
      .groupBy(col("p.ls").as("ls"), col("p.rs").as("rs"))
      .agg(sum("freq").as("cnt"))

  /** Greedy left-to-right non-overlapping application of one merge, as a
    * codegen'd `aggregate()` fold — no shuffle, no UDF. Symbols are
    * `[a-z]+` by construction (wordDict), so the literals embed safely. */
  def applyMerge(dict: DataFrame, lsym: String, rsym: String): DataFrame = {
    require(lsym.matches("[a-z]+") && rsym.matches("[a-z]+"),
      s"symbols must be lowercase alpha: '$lsym' '$rsym'")
    dict.withColumn("syms", array_join(expr(
      s"""aggregate(split(syms, ' '), cast(array() as array<string>),
         |  (acc, x) -> CASE
         |    WHEN size(acc) > 0 AND element_at(acc, -1) = '$lsym'
         |         AND x = '$rsym'
         |    THEN concat(slice(acc, 1, size(acc) - 1), array('$lsym$rsym'))
         |    ELSE concat(acc, array(x)) END)""".stripMargin), " "))
  }

  /** `rounds` merge rounds over an initialized dict → (final dict, the
    * learned merge table with per-round corpus token counts). */
  def train(dict0: DataFrame, rounds: Int): (DataFrame, Seq[Merge]) = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    // dict is vocabulary-sized; per-round localCheckpoint cuts the
    // iterative lineage (the CC/PageRank/SSSP discipline)
    var dict = initSymbols(dict0).localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to rounds) {
      val top = pairCounts(dict)
        .agg(min(struct((-col("cnt")).as("nc"), col("ls"), col("rs"))).as("m"))
        .select(col("m.ls"), col("m.rs"), (-col("m.nc")).as("cnt"))
        .head()
      require(!top.isNullAt(0),
        s"round $r: no adjacent pairs left — corpus fully merged")
      val (l, rr, c) = (top.getString(0), top.getString(1), top.getLong(2))
      dict = applyMerge(dict, l, rr).localCheckpoint(true)
      val toks = dict
        .agg(sum(col("freq") * size(split(col("syms"), " "))))
        .head().getLong(0)
      merges += Merge(r, l, rr, c, toks)
    }
    (dict, merges.result())
  }
}
