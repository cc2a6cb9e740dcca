package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 forty-fourth batch: k-center greedy diverse-subset selection
  * over int8 embeddings (Gonzalez coreset, exact-integer distances), an
  * AMS F2 sketch accuracy audit against the exact self-join size, and
  * IPF/Furness origin-destination matrix balancing in scaled integers. */
object EntryRound5ar {

  private val K = 4 // greedy picks (seed + 3)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // diverse subset: pick K maximally-spread embeddings — each round is
    // one narrow min-distance update + one argmax; the trace (order, id,
    // distance-at-pick) is bit-reproducible because distances are exact
    // longs over the int8 quantization
    "q270_kcenter_greedy" -> ((s, dir) =>
      graft.ml.Coreset.kCenterGreedy(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        K)),

    // sketch audit: the AMS F2 estimator (16 deterministic sign hashes)
    // vs the exact second frequency moment of the language distribution —
    // the "how big is the self-join" planner statistic, with both the
    // estimate and the truth exact integers
    "q271_ams_f2" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/documents.parquet")
        .groupBy("lang").agg(count(lit(1)).as("c"))
        .withColumn("keynum",
          expr("ascii(substr(lang, 1, 1)) * 256 + ascii(substr(lang, 2, 1))"))
      val exact = c.agg(sum(expr("c * c")).as("f2_exact"))
      val est = c
        .crossJoin(s.range(16).select(col("id").as("j")))
        .withColumn("sign", expr(
          "2 * (((keynum * (2 * j + 1) * 2654435761) div 8192) % 2) - 1"))
        .groupBy("j").agg(sum(expr("sign * c")).as("z"))
        .agg(expr("sum(z * z) div 16").as("f2_est"))
      exact.crossJoin(est)
    }),

    // spatial-interaction balancing: 2 rounds of IPF (row scale, column
    // scale) over a 7 x 7 OD seed in 1e6-unit integers — every division
    // floors identically on both engines, so the balanced matrix is
    // bit-stable; windows are per-row/per-column keyed sums
    "q272_ipf_balance" -> ((s, dir) => {
      // j from the div-7 digit so (i, j) genuinely spans the 7 x 7 grid
      // ((doc_id·k + c) % 7 alone would be a function of i)
      val t0 = s.read.parquet(s"$dir/documents.parquet")
        .groupBy((col("doc_id") % 7).as("i"),
          expr("(doc_id div 7) % 7").as("j"))
        .agg((count(lit(1)) * 1000000L).as("t"))
      val total = Window.partitionBy()
      val byI = Window.partitionBy("i")
      val byJ = Window.partitionBy("j")
      val withTarget = t0
        .withColumn("tot", sum("t").over(total))
        .withColumn("target", expr("tot div 7")).drop("tot")
      def rowScale(df: DataFrame) = df
        .withColumn("t", expr("(t * target) div rs"))
      def colScale(df: DataFrame) = df
        .withColumn("t", expr("(t * target) div cs"))
      var t = withTarget
      for (_ <- 1 to 2) {
        t = rowScale(t.withColumn("rs", sum("t").over(byI)))
        t = colScale(t.withColumn("cs", sum("t").over(byJ)))
      }
      t.select(col("i"), col("j"), col("t").as("t_e6"))
    })
  )

  /** DuckDB int8 quantization + pairwise distance helpers for q270. */
  private val quantSql: String =
    """SELECT vec_id AS id, list_transform(embedding, x ->
      |    CAST(floor(CAST(x AS DOUBLE) * 127.0 / greatest(1e-30, m)
      |      + 0.5) AS INT)) AS q8
      |FROM (SELECT vec_id, embedding,
      |        list_aggregate(list_transform(embedding,
      |          x -> abs(CAST(x AS DOUBLE))), 'max') AS m
      |      FROM embeddings)""".stripMargin

  private def d2Sql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> " +
      s"CAST($a[i] - $b[i] AS BIGINT) * ($a[i] - $b[i])))"

  /** Unrolled greedy oracle: c0 seed, then K-1 argmax/min-update stages. */
  private def kcenterOracle: String = {
    val sb = new StringBuilder
    sb.append(s"WITH q AS ($quantSql),\n")
    sb.append("c0 AS (SELECT id, q8 FROM q ORDER BY id LIMIT 1),\n")
    sb.append("m0 AS (SELECT q.id, q.q8, " +
      d2Sql("q.q8", "c.q8") + " AS md FROM q, c0 c)")
    val excluded = new StringBuilder("SELECT id FROM c0")
    for (s <- 1 until K) {
      sb.append(s",\np$s AS (SELECT id, md, q8 FROM m${s - 1} " +
        s"WHERE id NOT IN ($excluded) ORDER BY md DESC, id LIMIT 1)")
      if (s < K - 1)
        sb.append(s",\nm$s AS (SELECT m.id, m.q8, least(m.md, " +
          d2Sql("m.q8", "p.q8") + s") AS md FROM m${s - 1} m, p$s p)")
      excluded.append(s" UNION ALL SELECT id FROM p$s")
    }
    sb.append("\nSELECT CAST(0 AS INT) AS sel_order, id, " +
      "CAST(0 AS BIGINT) AS dist_sq FROM c0")
    for (s <- 1 until K)
      sb.append(s"\nUNION ALL SELECT CAST($s AS INT), id, " +
        s"CAST(md AS BIGINT) FROM p$s")
    sb.toString
  }

  def oracles: Map[String, String] = Map(

    "q270_kcenter_greedy" -> kcenterOracle,

    "q271_ams_f2" ->
      """WITH c AS (SELECT lang, count(*) AS c,
        |    ascii(substr(lang, 1, 1)) * 256 + ascii(substr(lang, 2, 1))
        |      AS keynum
        |  FROM documents GROUP BY lang),
        |e AS (SELECT j, sum(
        |    (2 * (((keynum * (2 * j + 1) * 2654435761) // 8192) % 2) - 1)
        |      * c) AS z
        |  FROM c, (SELECT unnest(range(16)) AS j) t GROUP BY j)
        |SELECT (SELECT CAST(sum(c * c) AS BIGINT) FROM c) AS f2_exact,
        |  CAST(sum(z * z) // 16 AS BIGINT) AS f2_est
        |FROM e""".stripMargin,

    "q272_ipf_balance" ->
      """WITH t0 AS (SELECT doc_id % 7 AS i, (doc_id // 7) % 7 AS j,
        |    count(*) * 1000000 AS t
        |  FROM documents GROUP BY 1, 2),
        |tt AS (SELECT *, sum(t) OVER () // 7 AS target FROM t0),
        |r1 AS (SELECT i, j, target,
        |    (t * target) // sum(t) OVER (PARTITION BY i) AS t FROM tt),
        |c1 AS (SELECT i, j, target,
        |    (t * target) // sum(t) OVER (PARTITION BY j) AS t FROM r1),
        |r2 AS (SELECT i, j, target,
        |    (t * target) // sum(t) OVER (PARTITION BY i) AS t FROM c1),
        |c2 AS (SELECT i, j, target,
        |    (t * target) // sum(t) OVER (PARTITION BY j) AS t FROM r2)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  CAST(t AS BIGINT) AS t_e6
        |FROM c2""".stripMargin
  )
}
