package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift via per-term Pearson chi-square: given two corpus slices
  * (e.g. two crawl snapshots, or two domains), score every term's 2×2
  * contingency table — term-vs-rest × slice1-vs-slice2 — with
  * χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)). The significance-test
  * companion to the trending-terms ratio monitor (q133): a term that
  * doubled from 1 to 2 occurrences ranks below a term that moved
  * 500 → 900, which a raw ratio inverts.
  *
  * Numeric discipline: the contingency cells and cross products ad/bc are
  * EXACT Longs (token totals fit comfortably); the single division is one
  * double expression quantized to integer micro-units with one round —
  * the q79/q151 micro-nat pattern, bit-identical across engines because
  * both evaluate the same IEEE expression tree on the same integer inputs.
  *
  * Scale shape: one (term) keyed aggregate over the token stream (map-side
  * partial), the two slice totals via one tiny 1-row aggregate broadcast
  * into the term table, then a narrow per-term projection and filter — NO
  * window, no sort, no driver loop. Thresholds (minTotal, minChiMicro)
  * bound the output instead of a global top-k rank.
  */
object Drift {

  /** `(id, text, slice∈{0,1})` → `(w, c1, c2, chi2_micro)` for terms with
    * c1+c2 ≥ minTotal and χ²·10⁶ ≥ minChiMicro. */
  def chiSquareTerms(docs: DataFrame, textCol: String, sliceCol: String,
                     minTotal: Long = 10L, minChiMicro: Long = 0L): DataFrame = {
    val counts = docs
      .select(col(sliceCol).cast("int").as("slice"),
        explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w")
      .agg(sum(when(col("slice") === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("slice") === 1, 1L).otherwise(0L)).as("c2"))
      .transform(graft.spark.PersistTracker.persist) // totals + the scored pass
    // slice totals over ALL terms (not just the minTotal survivors — the
    // contingency margins are corpus-wide), one 1-row aggregate broadcast
    val totals = counts.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    counts
      .where(col("c1") + col("c2") >= minTotal)
      .crossJoin(broadcast(totals))
      .select(col("w"), col("c1"), col("c2"),
        expr(
          """CAST(round((1000000.0 * CAST(n1 + n2 AS DOUBLE)
            |  * CAST(c1 * (n2 - c2) - c2 * (n1 - c1) AS DOUBLE)
            |  * CAST(c1 * (n2 - c2) - c2 * (n1 - c1) AS DOUBLE))
            |  / (CAST(c1 + c2 AS DOUBLE) * CAST(n1 + n2 - c1 - c2 AS DOUBLE)
            |     * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) AS BIGINT)""".stripMargin)
          .as("chi2_micro"))
      .where(col("chi2_micro") >= minChiMicro)
  }
}
