package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 fifty-fifth batch: water-filling budget allocation (the
  * data-mixture cap rule — saturate small domains, level the rest),
  * Johnson–Lindenstrauss ±1 random projection with an exact norm audit,
  * and a sortedness (adjacent-inversion) audit for compaction planning. */
object EntryRound5bd {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // waterfill: allocate B = Σcap/2 tokens across hosts as
    // alloc = min(cap, λ) with the exact integer water level λ found by
    // the sorted-prefix cut (λ_r = (B − P_{r−1}) div (n−r+1), first rank
    // where λ_r < cap_r) — the per-domain cap rule a mixture designer
    // runs; windows act on the tiny per-host aggregate
    "q304_waterfill" -> ((s, dir) => {
      val caps = s.read.parquet(s"$dir/documents.parquet")
        .groupBy((col("doc_id") % 97).as("host"))
        .agg(sum("n_chars").as("cap"))
      val all = Window.partitionBy()
      val ord = Window.orderBy(col("cap").asc, col("host").asc)
      val t = caps
        .withColumn("b", expr("sum(cap) over () div 2"))
        .withColumn("n", count(lit(1)).over(all))
        .withColumn("r", row_number().over(ord))
        .withColumn("pprev", coalesce(sum("cap").over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("lam", expr("(b - pprev) div (n - r + 1)"))
        .withColumn("flagged", (col("lam") < col("cap")).cast("int"))
      val cut = t.withColumn("cutr",
          min(when(col("flagged") === 1, col("r"))).over(all))
        .withColumn("lamcut",
          max(when(col("r") === col("cutr"), col("lam"))).over(all))
      cut.select(col("host"), col("cap"),
        when(col("cutr").isNull || col("r") < col("cutr"), col("cap"))
          .otherwise(col("lamcut")).as("alloc"))
    }),

    // JL projection: 64-dim int8 embeddings → 16 dims via a
    // deterministic ±1 sign matrix; emits each vector's exact original
    // and projected squared norms — the distance-preservation audit run
    // before trusting the sketch for ANN (E[‖Px‖²] = d_out/d_in·‖x‖²
    // up to the sign-matrix variance)
    "q305_jl_projection" -> ((s, dir) => {
      val q8 = graft.ml.Quantize.int8(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      val terms = q8.select(col("id"),
          posexplode(col("q8")).as(Seq("j", "v")))
        .crossJoin(broadcast(
          s.range(16).select(col("id").as("d"))))
        .withColumn("sign", expr(
          "2 * ((((j + 1) * 2654435761 + (d + 1) * 40503) div 128) % 2) - 1"))
      val proj = terms.groupBy("id", "d")
        .agg(sum(expr("sign * v")).as("p"))
        .groupBy("id").agg(sum(expr("p * p")).as("proj_sq"))
      val orig = q8.select(col("id"), expr(
        "aggregate(q8, 0L, (acc, x) -> acc + cast(x as bigint) * x)")
        .as("orig_sq"))
      orig.join(proj, "id")
        .select(col("id"), col("orig_sq"), col("proj_sq"),
          expr("CASE WHEN orig_sq > 0 THEN (1000 * proj_sq) div " +
            "(16 * orig_sq) ELSE -1 END").as("ratio_e3_per_dim"))
    }),

    // sortedness audit: what fraction of ADJACENT row pairs (in doc_id
    // order) are out of order by the layout key — the statistic a
    // compaction planner reads to decide whether a re-sort pays; global
    // positions from the distributed rank, inversions from one lag
    "q306_sortedness" -> ((s, dir) => {
      val keyed = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          expr("(doc_id * 48271) % 8000").as("zkey"))
      val ranked = graft.operators.StrPack.groupedRank(
        keyed, Nil, "doc_id", "doc_id", "pos")
      val succ = ranked.select(col("zkey").as("next_zkey"),
        (col("pos") - 1).as("pos"))
      ranked.join(succ, "pos")
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("next_zkey") < col("zkey")).cast("long"))
            .as("n_inversions"))
        .withColumn("inversion_e6",
          expr("(1000000 * n_inversions) div n_pairs"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q304_waterfill" ->
      """WITH caps AS (SELECT doc_id % 97 AS host, sum(n_chars) AS cap
        |  FROM documents GROUP BY 1),
        |t AS (SELECT host, cap,
        |    sum(cap) OVER () // 2 AS b,
        |    count(*) OVER () AS n,
        |    row_number() OVER (ORDER BY cap, host) AS r,
        |    coalesce(sum(cap) OVER (ORDER BY cap, host
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS pprev
        |  FROM caps),
        |l AS (SELECT *, (b - pprev) // (n - r + 1) AS lam FROM t),
        |c AS (SELECT *, min(CASE WHEN lam < cap THEN r END) OVER ()
        |        AS cutr FROM l),
        |f AS (SELECT *, max(CASE WHEN r = cutr THEN lam END) OVER ()
        |        AS lamcut FROM c)
        |SELECT host, CAST(cap AS BIGINT) AS cap,
        |  CAST(CASE WHEN cutr IS NULL OR r < cutr THEN cap
        |       ELSE lamcut END AS BIGINT) AS alloc
        |FROM f""".stripMargin,

    "q305_jl_projection" ->
      """WITH q AS (SELECT vec_id AS id, list_transform(embedding, x ->
        |    CAST(floor(CAST(x AS DOUBLE) * 127.0 / greatest(1e-30, m)
        |      + 0.5) AS INT)) AS q8
        |  FROM (SELECT vec_id, embedding,
        |        list_aggregate(list_transform(embedding,
        |          x -> abs(CAST(x AS DOUBLE))), 'max') AS m
        |      FROM embeddings)),
        |terms AS (SELECT id, j, q8[j] AS v, d,
        |    2 * (((j * 2654435761 + (d + 1) * 40503) // 128) % 2) - 1
        |      AS sign
        |  FROM q, (SELECT unnest(range(1, 65)) AS j) jj,
        |       (SELECT unnest(range(16)) AS d) dd),
        |proj AS (SELECT id, sum(p * p) AS proj_sq FROM (
        |    SELECT id, d, sum(sign * v) AS p FROM terms GROUP BY 1, 2)
        |  GROUP BY id),
        |orig AS (SELECT id, list_sum(list_transform(q8, x ->
        |    CAST(x AS BIGINT) * x)) AS orig_sq FROM q)
        |SELECT orig.id, CAST(orig_sq AS BIGINT) AS orig_sq,
        |  CAST(proj_sq AS BIGINT) AS proj_sq,
        |  CAST(CASE WHEN orig_sq > 0
        |    THEN (1000 * proj_sq) // (16 * orig_sq)
        |    ELSE -1 END AS BIGINT) AS ratio_e3_per_dim
        |FROM orig JOIN proj ON proj.id = orig.id""".stripMargin,

    "q306_sortedness" ->
      """WITH k AS (SELECT doc_id, (doc_id * 48271) % 8000 AS zkey
        |  FROM documents),
        |l AS (SELECT zkey, lead(zkey) OVER (ORDER BY doc_id) AS nz
        |      FROM k)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN nz < zkey THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_inversions,
        |  CAST((1000000 * sum(CASE WHEN nz < zkey THEN 1 ELSE 0 END))
        |    // count(*) AS BIGINT) AS inversion_e6
        |FROM l WHERE nz IS NOT NULL""".stripMargin
  )
}
