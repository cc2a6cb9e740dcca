package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Normalization-canonical exact dedup (the C4 recipe): lowercase, strip
  * everything but [a-z0-9 ], collapse runs of spaces, trim — then group by
  * the md5 of the normalized form. Catches the case/punctuation variants
  * byte-exact dedup misses ("Hello, World!" vs "hello world") while
  * staying pure codegen: two regexp_replace + lower + md5 map-side, one
  * (hash) keyed aggregate — ids and 128-bit hashes are all that shuffle,
  * the q11 discipline. The regex classes are ASCII-literal so Java regex
  * (engine) and RE2 (oracle) agree symbol for symbol. */
object NormalizeDedup {

  def normalizedCol(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Duplicate groups under normalization: `(nh, rep_id, n_members)` for
    * groups with ≥ 2 members (rep = min id — the keep decision). */
  def dupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), md5(normalizedCol(col(textCol))).as("nh"))
      .groupBy("nh")
      .agg(min("id").as("rep_id"), count(lit(1)).as("n_members"))
      .where(col("n_members") > 1)
}
