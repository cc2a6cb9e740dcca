package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** 2-D skyline (Pareto frontier, maximize both axes): the rows no other
  * row weakly dominates (>= on both signals, > on at least one) — the
  * data-selection frontier a training-mix curator reads ("longest AND
  * most lexically diverse documents", cost/quality trade-offs).
  *
  * Distributed shape: the classical sort-based skyline needs one global
  * order — a scale-killer (the q133 lesson) — so phase 1 computes a
  * per-salt LOCAL skyline (windows partitioned by a hash salt; every
  * global-skyline row survives its own salt's pass, because removing
  * rows can only remove dominators), and phase 2 runs the exact pairwise
  * dominance test on the salts' survivors — a candidate set bounded by
  * `salts × |local skyline|`, small enough to broadcast. Both phases are
  * deterministic; exact (s1,s2) ties survive together, matching the
  * NOT-EXISTS oracle. */
object Skyline {

  /** `(idCol, s1, s2)` (long signals, maximize both) → the skyline rows
    * `(id, s1, s2)`. */
  def skyline2(df: DataFrame, idCol: String, s1: String, s2: String,
               salts: Int = 32): DataFrame = {
    require(salts >= 1, s"salts must be >= 1: $salts")
    val base = df.select(col(idCol).as("id"),
      col(s1).cast("long").as("s1"), col(s2).cast("long").as("s2"))
    // dominators with STRICTLY greater s1: a value-based (RANGE) frame
    // ending one below the current s1; dominators with EQUAL s1: the
    // group max of s2. A row survives locally iff no strictly-higher-s1
    // row reaches its s2 and it tops (possibly tied) its own s1 group.
    val wGt = Window.partitionBy("__salt").orderBy(col("s1").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy("__salt", "s1")
    val local = base
      .withColumn("__salt", pmod(hash(col("id")), lit(salts)))
      .withColumn("__mGt", max("s2").over(wGt))
      .withColumn("__mEq", max("s2").over(wEq))
      .where((col("__mGt").isNull || col("__mGt") < col("s2")) &&
        col("s2") === col("__mEq"))
      .select("id", "s1", "s2")
    // phase 2: exact weak-dominance anti-join on the small candidate set
    local.as("a").join(broadcast(local.as("b")),
        col("b.s1") >= col("a.s1") && col("b.s2") >= col("a.s2") &&
          (col("b.s1") > col("a.s1") || col("b.s2") > col("a.s2")),
        "left_anti")
      .select(col("id"), col("s1"), col("s2"))
  }
}
