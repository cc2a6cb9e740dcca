package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 forty-ninth batch: Bradley–Terry preference aggregation (the
  * pairwise-comparison strength model behind preference-data pipelines,
  * two MM rounds in exact scaled integers), a dbt-style data-quality
  * constraint suite (unique / FK / not-null / range violations), and
  * mutual information between lang and source in quantized micro-nats. */
object EntryRound5aw {

  /** Pairwise preference fixture: 31 items; each doc votes on one pair,
    * winner by a deterministic hash gate. */
  private def prefPairs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select((col("doc_id") % 31).as("a"),
        expr("(doc_id * 7 + 5) % 31").as("b"),
        ((col("doc_id") * 2654435761L) % 100L < 55L).as("a_wins"))
      .where(col("a") =!= col("b"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bradley–Terry via MM (Hunter 2004): w_i ← W_i / Σ_j n_ij/(w_i+w_j),
    // two rounds, each term independently floored in 1e6 units (the
    // micro-nat discipline applied to a fitting loop) — every join is
    // keyed by item, the pair table aggregates once up front
    "q285_bradley_terry" -> ((s, dir) => {
      val p = prefPairs(s, dir)
      // directed wins i over j, then symmetric game counts
      val wins = p.select(
          when(col("a_wins"), col("a")).otherwise(col("b")).as("i"),
          when(col("a_wins"), col("b")).otherwise(col("a")).as("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("w"))
        .transform(graft.spark.PersistTracker.persist)
      val games = wins.select(col("i"), col("j"), col("w"))
        .unionAll(wins.select(col("j").as("i"), col("i").as("j"),
          col("w")))
        .groupBy("i", "j").agg(sum("w").as("n"))
        .transform(graft.spark.PersistTracker.persist)
      val bigW = wins.groupBy("i").agg(sum("w").as("bigw"))
      var w = games.select(col("i")).distinct()
        .withColumn("wmu", lit(1000000L))
      for (_ <- 1 to 2) {
        val d = games
          .join(w.toDF("i", "wi"), "i")
          .join(w.toDF("j", "wj"), "j")
          .select(col("i"),
            expr("(n * 1000000000000) div (wi + wj)").as("term"))
          .groupBy("i").agg(sum("term").as("d"))
        w = d.join(bigW, "i")
          .select(col("i"), expr("(bigw * 1000000000000) div d").as("wmu"))
      }
      w.join(bigW, "i")
        .select(col("i").as("item"), col("bigw").as("wins"),
          col("wmu").as("strength_e6"))
    }),

    // constraint suite: the release-gate DQ report — each rule is one
    // aggregate / anti-join, emitted as (constraint, n_violations)
    "q286_dq_constraints" -> ((s, dir) => {
      import s.implicits._
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val dupKeys = orders.groupBy("o_orderkey")
        .agg(count(lit(1)).as("c")).where(col("c") > 1)
        .agg(coalesce(sum(col("c") - 1), lit(0L))).head.getLong(0)
      val orphans = orders.join(cust,
          col("o_custkey") === col("c_custkey"), "left_anti")
        .count()
      val nullLang = docs.where(col("lang").isNull).count()
      val negBal = cust.where(col("c_acctbal") < 0).count()
      val highPrio = orders.where(col("o_totalprice") <= 0).count()
      Seq(
        ("unique:orders.o_orderkey", dupKeys),
        ("fk:orders.o_custkey->customer", orphans),
        ("not_null:documents.lang", nullLang),
        ("range:customer.c_acctbal>=0", negBal),
        ("range:orders.o_totalprice>0", highPrio))
        .toDF("rule", "n_violations")
    }),

    // MI(lang; source): Σ_ij round(1e6·(c_ij/N)·ln(c_ij·N/(c_i·c_j))) —
    // per-pair terms quantized independently from exact integer operands
    // (the cellEntropy construction), summed exactly; per-pair rows plus
    // the total over the tiny |langs|×|sources| frame
    "q287_mutual_information" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val cij = d.groupBy("lang", "source").agg(count(lit(1)).as("c"))
      val ci = Window.partitionBy("lang")
      val cj = Window.partitionBy("source")
      val all = Window.partitionBy()
      cij
        .withColumn("cl", sum("c").over(ci))
        .withColumn("cs", sum("c").over(cj))
        .withColumn("n", sum("c").over(all))
        .withColumn("term_micro",
          round(lit(1e6) * (col("c") / col("n")) *
            log((col("c") * col("n")) / (col("cl") * col("cs"))), 0)
            .cast("long"))
        .withColumn("mi_micro", sum("term_micro").over(all))
        .select(col("lang"), col("source"), col("c"), col("term_micro"),
          col("mi_micro"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q285_bradley_terry" ->
      """WITH p AS (SELECT doc_id % 31 AS a, (doc_id * 7 + 5) % 31 AS b,
        |    (doc_id * 2654435761) % 100 < 55 AS a_wins
        |  FROM documents WHERE doc_id % 31 <> (doc_id * 7 + 5) % 31),
        |wd AS (SELECT CASE WHEN a_wins THEN a ELSE b END AS i,
        |    CASE WHEN a_wins THEN b ELSE a END AS j, count(*) AS w
        |  FROM p GROUP BY 1, 2),
        |games AS (SELECT i, j, sum(w) AS n FROM (
        |    SELECT i, j, w FROM wd
        |    UNION ALL SELECT j, i, w FROM wd) GROUP BY 1, 2),
        |bigw AS (SELECT i, sum(w) AS bigw FROM wd GROUP BY i),
        |w0 AS (SELECT DISTINCT i, 1000000 AS wmu FROM games),
        |d1 AS (SELECT g.i, sum((g.n * 1000000000000)
        |      // (wi.wmu + wj.wmu)) AS d
        |  FROM games g JOIN w0 wi ON wi.i = g.i JOIN w0 wj ON wj.i = g.j
        |  GROUP BY g.i),
        |w1 AS (SELECT d1.i, (bigw.bigw * 1000000000000) // d1.d AS wmu
        |  FROM d1 JOIN bigw ON bigw.i = d1.i),
        |d2 AS (SELECT g.i, sum((g.n * 1000000000000)
        |      // (wi.wmu + wj.wmu)) AS d
        |  FROM games g JOIN w1 wi ON wi.i = g.i JOIN w1 wj ON wj.i = g.j
        |  GROUP BY g.i),
        |w2 AS (SELECT d2.i, (bigw.bigw * 1000000000000) // d2.d AS wmu
        |  FROM d2 JOIN bigw ON bigw.i = d2.i)
        |SELECT w2.i AS item, CAST(bigw.bigw AS BIGINT) AS wins,
        |  CAST(w2.wmu AS BIGINT) AS strength_e6
        |FROM w2 JOIN bigw ON bigw.i = w2.i""".stripMargin,

    "q286_dq_constraints" ->
      """SELECT 'unique:orders.o_orderkey' AS rule,
        |  CAST(coalesce((SELECT sum(c - 1) FROM (
        |    SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
        |    WHERE c > 1), 0) AS BIGINT) AS n_violations
        |UNION ALL
        |SELECT 'fk:orders.o_custkey->customer',
        |  CAST((SELECT count(*) FROM orders WHERE o_custkey NOT IN
        |    (SELECT c_custkey FROM customer)) AS BIGINT)
        |UNION ALL
        |SELECT 'not_null:documents.lang',
        |  CAST((SELECT count(*) FROM documents WHERE lang IS NULL)
        |    AS BIGINT)
        |UNION ALL
        |SELECT 'range:customer.c_acctbal>=0',
        |  CAST((SELECT count(*) FROM customer WHERE c_acctbal < 0)
        |    AS BIGINT)
        |UNION ALL
        |SELECT 'range:orders.o_totalprice>0',
        |  CAST((SELECT count(*) FROM orders WHERE o_totalprice <= 0)
        |    AS BIGINT)""".stripMargin,

    "q287_mutual_information" ->
      """WITH cij AS (SELECT lang, source, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |t AS (SELECT lang, source, c,
        |    sum(c) OVER (PARTITION BY lang) AS cl,
        |    sum(c) OVER (PARTITION BY source) AS cs,
        |    sum(c) OVER () AS n
        |  FROM cij),
        |q AS (SELECT lang, source, c,
        |    CAST(round(1e6 * (c / CAST(n AS DOUBLE)) *
        |      ln((c * n) / CAST(cl * cs AS DOUBLE)), 0) AS BIGINT)
        |      AS term_micro
        |  FROM t)
        |SELECT lang, source, CAST(c AS BIGINT) AS c, term_micro,
        |  CAST(sum(term_micro) OVER () AS BIGINT) AS mi_micro
        |FROM q""".stripMargin
  )
}
