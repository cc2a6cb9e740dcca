package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement (Efraimidis–Sprites 2006): each
  * row draws a content-free uniform u from its id's md5 and gets the key
  * ln(u)/w — the top-k by key is an exact weighted sample, reproducible on
  * any engine because u is hash-derived (no RNG state) and the key is
  * quantized to integer micro-units by one double rounding (the q151
  * discipline). The data-mixing subsample step: "take 50 docs, quality-
  * weighted" with an auditable, re-runnable draw.
  *
  * The uniform: the first 6 hex nibbles of md5(id) as a 24-bit integer v,
  * u = (v+1)/2²⁴ ∈ (0,1] — computed by the SAME character arithmetic in
  * the engine and the oracle (no engine-specific hash or hex-parse
  * builtin). Top-k via the salted two-phase rank (q133 discipline): per-
  * salt top-k bounds every window partition, the final rank sees ≤ k·salts
  * rows. */
object WeightedSample {

  /** SQL for the 24-bit integer from the first 6 hex chars of md5(idExpr)
    * — portable character arithmetic (ascii/CASE only). */
  private[graft] def hexValSql(idExpr: String): String = {
    val digits = (1 to 6).map { i =>
      val c = s"substr(md5(CAST($idExpr AS STRING)), $i, 1)"
      s"(ascii($c) - (CASE WHEN $c <= '9' THEN 48 ELSE 87 END)) * ${1L << (4 * (6 - i))}"
    }
    digits.mkString("(", " + ", ")")
  }

  /** `(id, w > 0)` rows → top `k` by the E-S key, reported as
    * (rank, id, w, key_micro) with key_micro = round(1e6·ln(u)/w). */
  def topKWeighted(df: DataFrame, idCol: String, weightCol: String,
                   k: Int, salts: Int = 16): DataFrame = {
    require(k > 0 && salts > 0, s"need k > 0, salts > 0 (got $k/$salts)")
    val keyed = df.select(col(idCol).cast("long").as("id"),
        col(weightCol).cast("long").as("w"))
      .where(col("w") > 0)
      .withColumn("key_micro", expr(
        s"CAST(round(1000000.0 * ln((${hexValSql("id")} + 1) / 16777216.0)" +
          " / CAST(w AS DOUBLE)) AS BIGINT)"))
    val order = Seq(col("key_micro").desc, col("id").asc)
    keyed
      .withColumn("__salt", pmod(hash(col("id")), lit(salts)))
      .withColumn("__pr", row_number().over(
        Window.partitionBy("__salt").orderBy(order: _*)))
      .where(col("__pr") <= k)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
      .where(col("rank") <= k)
      .select(col("rank").cast("int").as("rank"), col("id"), col("w"),
        col("key_micro"))
  }
}
