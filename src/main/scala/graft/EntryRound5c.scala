package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 third batch: BM25 retrieval, k-core decomposition, an integer
  * k-means step over quantized embeddings, and a bucketed co-located
  * join — each with a closed-form DuckDB oracle. */
object EntryRound5c {

  /** The q152 fixture graph: sparser than the q144/q150 97-node orbit
    * (389 nodes, 1/3 of docs dropped) so the k = 3 peel takes three
    * genuine rounds to a 330-node core instead of terminating
    * immediately. */
  private def kcoreEdges(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"),
        explode(array(lit(7919L), lit(15838L), lit(23757L))).as("p"))
      .select((col("doc_id") % 389).as("src"),
        ((col("doc_id") * 31 + col("p")) % 389).as("dst"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Okapi BM25 top-k retrieval in exact integer arithmetic (cleared
    // k1/b/avgdl fractions + one micro-nat idf quantization per term);
    // oracle re-derives every score from the same closed formula
    "q151_bm25_topk" -> ((s, dir) => {
      import graft.text.CrawlOps
      CrawlOps.bm25TopK(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          queries = Seq(
            0 -> Seq("table", "scan", "join"),
            1 -> Seq("window", "data"),
            2 -> Seq("customer", "value", "fast", "slow")),
          k = 10)
        .orderBy("qid", "rank")
    }),

    // k-core decomposition of the link graph (k = 3): iterative peel over
    // (long, long) edges; the oracle replays the peel as a fixed chain of
    // degree/filter CTEs (6 rounds ≥ the graph's 3-round fixpoint, extra
    // rounds are no-ops)
    "q152_kcore" -> ((s, dir) =>
      graft.graph.KCore.core(kcoreEdges(s, dir), k = 3)
        .orderBy("id")),

    // one Lloyd iteration of k-means over int8-quantized embeddings
    // (centroids = quantized vectors 0..7): integer L2 assignment with
    // (dist, cid) tie-break, componentwise integer-mean update in the
    // shifted non-negative domain, per-cluster distance-sum monitor —
    // all re-derived by the oracle from DuckDB's list arithmetic
    "q153_kmeans_step" -> ((s, dir) => {
      import graft.ml.{Quantize, KMeansInt}
      val q = Quantize.int8(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
        .localCheckpoint(true)
      val cents = q.where(col("id") < 8)
        .select(col("id").as("cid"), col("q8").as("cq8"))
      KMeansInt.lloydStep(q, cents).orderBy("cid", "dim")
    }),

    // storage-level bucketing: doc-stats and doc-lang tables co-bucketed
    // on doc_id (8 buckets, sorted), joined WITHOUT a shuffle exchange on
    // either side (BucketedJoinSpec asserts the exchange-free SortMerge
    // plan) — the physical design for a 100 TB store's recurring joins;
    // the oracle checks the joined aggregate against the base table
    "q154_bucketed_join" -> ((s, dir) => {
      import graft.table.Bucketed
      val app = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val stats = Bucketed.writeTable(docs.select("doc_id", "n_chars"),
        s"g154_stats_$app", SparkEntry.scratch(s, "bkt_stats", dir),
        buckets = 8, keyCol = "doc_id")
      val langs = Bucketed.writeTable(docs.select("doc_id", "lang"),
        s"g154_langs_$app", SparkEntry.scratch(s, "bkt_langs", dir),
        buckets = 8, keyCol = "doc_id")
      stats.join(langs, "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("lang")
    })
  )

  /** The q152 oracle's peel round i: degrees over e(i−1), keep ≥ 3,
    * filter both endpoints. MATERIALIZED: an inlined chain expands each
    * e(i−1) reference multiplicatively — DuckDB re-opens the parquet
    * thousands of times and dies on file handles; materializing pins one
    * evaluation per round (what the engine's localCheckpoint does). */
  private def kcoreRound(i: Int): String =
    s"""d$i AS MATERIALIZED (SELECT id, count(*) AS deg FROM
       |  (SELECT a AS id FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1})
       |  GROUP BY id),
       |k$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg >= 3),
       |e$i AS MATERIALIZED (SELECT e${i - 1}.a, e${i - 1}.b FROM e${i - 1}
       |  JOIN k$i x ON e${i - 1}.a = x.id
       |  JOIN k$i y ON e${i - 1}.b = y.id)""".stripMargin

  def oracles: Map[String, String] = Map(

    "q151_bm25_topk" ->
      """WITH t AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |p AS (SELECT id, w, count(*) AS tf FROM t WHERE w <> ''
        |      GROUP BY 1, 2),
        |l AS (SELECT id, sum(tf) AS dl FROM p GROUP BY 1),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(dl) AS BIGINT) AS a FROM l),
        |q(qid, w) AS (VALUES (0, 'table'), (0, 'scan'), (0, 'join'),
        |  (1, 'window'), (1, 'data'),
        |  (2, 'customer'), (2, 'value'), (2, 'fast'), (2, 'slow')),
        |dfq AS (SELECT w, count(*) AS df FROM p
        |        WHERE w IN (SELECT w FROM q) GROUP BY w),
        |idf AS (SELECT w, CAST(round(
        |    ln(1 + (g.n - df + 0.5) / (df + 0.5)) * 1e6) AS BIGINT)
        |    AS idf_micro
        |  FROM dfq, g),
        |sc AS (SELECT q.qid, p.id,
        |    CAST(sum((idf_micro * 22 * g.a * p.tf) //
        |             (10 * g.a * p.tf + 3 * g.a + 9 * l.dl * g.n))
        |      AS BIGINT) AS score
        |  FROM p JOIN q USING (w) JOIN idf USING (w) JOIN l USING (id), g
        |  GROUP BY 1, 2),
        |r AS (SELECT qid, id, score, row_number() OVER
        |        (PARTITION BY qid ORDER BY score DESC, id) AS rank
        |      FROM sc)
        |SELECT CAST(qid AS INT) AS qid, CAST(rank AS INT) AS rank, id, score
        |FROM r WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    "q152_kcore" ->
      s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT least(a, b) AS a,
         |    greatest(a, b) AS b
         |  FROM (SELECT doc_id % 389 AS a, (doc_id*31 + p) % 389 AS b
         |        FROM documents, (SELECT unnest([7919, 15838, 23757]) AS p)
         |        WHERE doc_id % 3 <> 0)
         |  WHERE least(a, b) <> greatest(a, b)),
         |${(1 to 6).map(kcoreRound).mkString(",\n")},
         |df AS (SELECT id, count(*) AS deg FROM
         |  (SELECT a AS id FROM e6 UNION ALL SELECT b FROM e6)
         |  GROUP BY id)
         |SELECT id, deg FROM df WHERE deg >= 3 ORDER BY id""".stripMargin,

    "q153_kmeans_step" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 127 / greatest(1e-30,
        |      list_max(list_transform(embedding,
        |        y -> abs(CAST(y AS DOUBLE))))) + 0.5) AS INT)) AS q8
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cid, q8 AS cq8 FROM e WHERE vec_id < 8),
        |d AS (SELECT e.vec_id, c.cid,
        |    CAST(list_sum(list_transform(list_zip(e.q8, c.cq8),
        |      z -> CAST(z[1] - z[2] AS BIGINT) *
        |           CAST(z[1] - z[2] AS BIGINT))) AS BIGINT) AS dist
        |  FROM e, c),
        |a0 AS (SELECT vec_id, cid, dist, row_number() OVER
        |         (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |       FROM d),
        |asg AS (SELECT vec_id, cid, dist FROM a0 WHERE rn = 1),
        |m AS (SELECT asg.cid, generate_subscripts(e.q8, 1) - 1 AS dim,
        |        unnest(e.q8) AS x
        |      FROM asg JOIN e USING (vec_id)),
        |nc AS (SELECT cid, dim, count(*) AS n_members,
        |    CAST((sum(x + 127) // count(*)) - 127 AS INT) AS cx
        |  FROM m GROUP BY 1, 2),
        |ds AS (SELECT cid, CAST(sum(dist) AS BIGINT) AS dist_sum
        |       FROM asg GROUP BY 1)
        |SELECT nc.cid, CAST(dim AS INT) AS dim, cx, n_members, ds.dist_sum
        |FROM nc JOIN ds USING (cid) ORDER BY cid, dim""".stripMargin,

    "q154_bucketed_join" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  )
}
