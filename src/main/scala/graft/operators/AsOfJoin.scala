package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for each left row `(key, t)`, the payload of the LATEST
  * right row `(key, t')` with `t' ≤ t` — the temporal-version lookup
  * (which robots.txt governed this capture? which config was live at this
  * event?). Spark has no native as-of join; the naive formulations are a
  * theta join (quadratic per key) or a per-row argmax subquery (a join
  * PLUS a shuffle per payload). This is the sort-merge formulation:
  *
  *   union both sides tagged → ONE exchange keyed on `key` → ONE ordered
  *   window pass carrying `last(payload-struct, ignoreNulls)` → keep left
  *   rows.
  *
  * Right rows sort before left rows at equal timestamps, making the match
  * inclusive (`t' ≤ t`, DuckDB/QuestDB ASOF semantics). Left rows with no
  * prior version keep a null payload (LEFT as-of). The payload rides in
  * one struct, so a right row whose individual payload FIELD is null
  * still supersedes older versions.
  *
  * Scale: cost is one shuffle of (key, time, payload) + a per-key ordered
  * scan — no row amplification, skew bounded by the hottest key's row
  * count exactly like any keyed window. */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           leftTimeCol: String, rightTimeCol: String,
           payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs payload columns")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payloadCols.contains),
      s"payload columns ${payloadCols.mkString(",")} collide with left side")
    val l = left.select(
      col(keyCol).as("__k"), col(leftTimeCol).cast("long").as("__t"),
      lit(1).as("__tag"), struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(
        right.select(payloadCols.map(col): _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType())(
            (s, f) => s.add(f))).as("__p"))
    val r = right.select(
      col(keyCol).as("__k"), col(rightTimeCol).cast("long").as("__t"),
      lit(0).as("__tag"), lit(null).cast(l.schema("__l").dataType).as("__l"),
      struct(payloadCols.map(col): _*).as("__p"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__pv", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        payloadCols.map(c => col(s"__pv.$c").as(c)): _*)
  }
}
