package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality and split-hygiene evaluation operators — the
  * measurement layer a data pipeline runs next to its retrieval index and
  * its train/test split. All metrics in exact integer milli/micro units
  * (1000000 div rank, 1000·hits div n_gold), so the report is bit-exact
  * on any engine. */
object EvalOps {

  /** MRR / recall@k of a top-k ranking `(qid, rank, id)` against a gold
    * set `(qid, id)`: per query, the rank of the first relevant hit
    * (0 = none), `mrr_micro` = 1000000 div first_rank, and `recall_milli`
    * = 1000·hits div n_gold. Two keyed aggregates — no window, no
    * collect; queries with zero hits still report (left join from the
    * gold-count side). */
  def mrrAtK(topk: DataFrame, gold: DataFrame): DataFrame = {
    val perQ = topk.join(gold, Seq("qid", "id"))
      .groupBy("qid")
      .agg(count(lit(1)).as("hits"), min("rank").as("first_rank"))
    gold.groupBy("qid").agg(count(lit(1)).as("n_gold"))
      .join(perQ, Seq("qid"), "left")
      .select(col("qid"), col("n_gold"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("first_rank"), lit(0)).cast("long").as("first_rank"),
        when(col("first_rank").isNull, lit(0L))
          .otherwise(expr("1000000 div first_rank")).cast("long").as("mrr_micro"),
        expr("(1000 * coalesce(hits, 0L)) div n_gold").as("recall_milli"))
  }

  /** Deterministic train/test split assignment by content-free id hash:
    * 0 (train) when the first hex nibble of md5(id) ≤ 'c' (13/16 ≈ 81 %),
    * 1 (test) otherwise — stable across engines (md5 of the decimal string
    * form), independent of row order, and NOT preserved by id arithmetic
    * (unlike `id mod k`, which a shifted duplicate id survives). */
  def hashSplitCol(idCol: Column): Column =
    when(substring(md5(idCol.cast("string")), 1, 1) <= "c", 0).otherwise(1)

  /** Split-leakage audit: near-duplicate pairs whose members landed in
    * DIFFERENT splits — the eval-contamination check a pipeline must run
    * before trusting held-out numbers (an exact or near copy of a test
    * document inside train leaks the answer). `pairs` is any verified
    * near-dup pair table `(id_a, id_b, …)`; `splits` maps id → split. */
  def splitLeaks(pairs: DataFrame, splits: DataFrame): DataFrame =
    pairs
      .join(splits.select(col("id").as("id_a"), col("split").as("split_a")), "id_a")
      .join(splits.select(col("id").as("id_b"), col("split").as("split_b")), "id_b")
      .where(col("split_a") =!= col("split_b"))
      .select(col("id_a"), col("id_b"), col("split_a").cast("int").as("split_a"),
        col("split_b").cast("int").as("split_b"))
}
