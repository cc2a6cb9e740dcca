package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the compression step a 100-TB embedding
  * store runs before indexing (4× smaller than float32, integer SIMD dot
  * products downstream). Symmetric per-vector scheme:
  *
  *   scale = max_i |v_i|   (in double),
  *   q_i   = floor(v_i · 127 / scale + 0.5)   ∈ [−127, 127]
  *
  * Every arithmetic step is a deterministic IEEE-double operation
  * (float→double widen, one multiply, one divide, floor) — identical on
  * any engine, so quantized vectors and every integer dot product built
  * from them are BIT-EXACT reproducible (the q99/q106 discipline: floats
  * confined to a fixed expression, then integers forever after).
  *
  * Scale: pure narrow per-row expressions (codegen'd HOFs). The in-lambda
  * `aggregate` for the scale is O(d) per element → O(d²) per row from
  * Catalyst's project-collapse re-inlining; at d = 64 that is ~4k flops
  * per row. For d ≥ 1k, materialize the scale column behind a
  * localCheckpoint barrier first (the documented HOF re-inline
  * trade-off). */
object Quantize {

  /** `(id, vec float[])` → `(id, q8 int[])`. Zero vectors quantize to
    * zeros (scale floor guards the 0/0). */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), expr(
      s"""transform($vecCol, x -> cast(floor(
         |  cast(x as double) * 127.0D /
         |  greatest(1e-30D, aggregate($vecCol, cast(0.0 as double),
         |    (a, y) -> greatest(a, abs(cast(y as double))))) + 0.5D)
         |  as int))""".stripMargin).as("q8"))

  /** Brute-force top-k neighbors per probe by INT dot product over the
    * quantized vectors: exact integer arithmetic end to end (|q| ≤ 127,
    * so a 64-dim dot ≤ ~2^20 — int-safe, summed as long). Probes
    * broadcast; ranking is the salted two-phase top-k. */
  def topKDotQuantized(df: DataFrame, idCol: String, vecCol: String,
                       probeIds: Seq[Long], k: Int,
                       salts: Int = 16): DataFrame = {
    require(probeIds.nonEmpty && k > 0, "need probes and k > 0")
    val q = int8(df, idCol, vecCol).localCheckpoint(true)
    val probes = q.where(col("id").isin(probeIds: _*))
      .select(col("id").as("qid"), col("q8").as("pq8"))
    val order = Seq(col("dot").desc, col("id").asc)
    q.join(broadcast(probes))
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), expr(
        "aggregate(zip_with(q8, pq8, (x, y) -> x * y), 0L, (a, x) -> a + x)")
        .as("dot"))
      .withColumn("__salt", pmod(hash(col("id")), lit(salts)))
      .withColumn("__pr", row_number().over(
        Window.partitionBy("qid", "__salt").orderBy(order: _*)))
      .where(col("__pr") <= k)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(order: _*)))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("int").as("rank"), col("id"),
        col("dot"))
  }
}
