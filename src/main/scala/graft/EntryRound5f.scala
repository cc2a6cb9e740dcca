package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 sixth batch: hybrid-retrieval RRF fusion, incremental
  * new-vs-corpus near-dup ingest, retrieval MRR/recall evaluation, and a
  * train/test split-leakage audit — each with a closed-form DuckDB
  * oracle. */
object EntryRound5f {

  private val bmQueries = Seq(
    0 -> Seq("table", "scan", "join"),
    1 -> Seq("window", "data"),
    2 -> Seq("customer", "value", "fast", "slow"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // hybrid search: BM25 lexical top-10 and int8-embedding dot top-10
    // fused by reciprocal-rank fusion in integer micro-units — the
    // standard two-tower + lexical blender; both input rankings and the
    // fused ordering are replayed exactly by the oracle
    "q162_rrf_fusion" -> ((s, dir) => {
      val bm = graft.text.CrawlOps.bm25TopK(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        queries = bmQueries, k = 10)
      val ann = graft.ml.Quantize.topKDotQuantized(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        probeIds = Seq(0L, 1L, 2L), k = 10)
      graft.text.Fusion.rrfFuse(Seq(bm, ann), k = 10)
        .orderBy("qid", "rank")
    }),

    // incremental ingest dedup: a new batch (every 4th doc, one appended
    // token) against the indexed corpus — band join is new×old ONLY, so
    // the old×old work is never redone; pairs exact-verified and the
    // oracle recomputes them from raw shingles
    "q163_incremental_dedup" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val corpus = docs.select(col("doc_id"), col("text"))
      val batch = docs.where(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(col("text"), lit(" graftmark")).as("text"))
      graft.text.IncrementalDedup.newVsCorpusPairs(
          corpus, batch, "doc_id", "text",
          n = 3, numHashes = 64, bands = 32, tau = 0.8)
        .orderBy("new_id", "old_id")
    }),

    // retrieval evaluation: MRR and recall@10 of the BM25 ranking against
    // a deterministic gold labeling (doc_id ≡ qid+7 mod 25), in integer
    // micro/milli units — two keyed aggregates, no window
    "q164_retrieval_mrr" -> ((s, dir) => {
      import s.implicits._
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val topk = graft.text.CrawlOps.bm25TopK(docs, "doc_id", "text",
        queries = bmQueries, k = 10)
      val qdf = Seq(0, 1, 2).toDF("qid")
      val gold = docs.select(col("doc_id").as("id"))
        .crossJoin(broadcast(qdf))
        .where(col("id") % 25 === col("qid") + 7)
      graft.text.EvalOps.mrrAtK(topk, gold).orderBy("qid")
    }),

    // split hygiene: near-dup pairs straddling the md5-hash train/test
    // split — the eval-contamination audit (a near copy of a test doc in
    // train leaks the answer); composes the verified q15 pair table with
    // the content-free hash split
    "q165_split_leakage" -> ((s, dir) => {
      import graft.text.{TextOps, EvalOps, PreCollapse}
      val corpus = graft.fixtures.TextFixtures.nearDupCorpus(s, dir, " graftmark")
      val pairs = TextOps.minHashLshPairs(corpus, "doc_id", "text",
        n = 3, numHashes = 64, bands = 32, tau = 0.8,
        preDedupExact = PreCollapse.Assume)
      val splits = corpus.select(col("doc_id").as("id"),
        EvalOps.hashSplitCol(col("doc_id")).as("split"))
      EvalOps.splitLeaks(pairs, splits).orderBy("id_a", "id_b")
    })
  )

  /** The q151 BM25 oracle chain (same queries), reused by q162/q164:
    * cleared-fraction integer scoring, full ranking in CTE `r`. */
  private val bm25Ctes: String =
    """t AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS w
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
      |      FROM sc)""".stripMargin

  def oracles: Map[String, String] = Map(

    "q162_rrf_fusion" ->
      s"""WITH $bm25Ctes,
         |r1 AS (SELECT qid, id, rank FROM r WHERE rank <= 10),
         |eq AS (SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 127 / greatest(1e-30,
         |      list_max(list_transform(embedding,
         |        y -> abs(CAST(y AS DOUBLE))))) + 0.5) AS INT)) AS q8
         |  FROM embeddings),
         |pb AS (SELECT vec_id AS qid, q8 AS pq8 FROM eq
         |       WHERE vec_id IN (0, 1, 2)),
         |dd AS (SELECT pb.qid, eq.vec_id AS id,
         |    CAST(list_sum(list_transform(list_zip(eq.q8, pb.pq8),
         |      z -> z[1] * z[2])) AS BIGINT) AS dot
         |  FROM eq, pb WHERE eq.vec_id <> pb.qid),
         |rr AS (SELECT qid, id, row_number() OVER
         |         (PARTITION BY qid ORDER BY dot DESC, id) AS rank
         |       FROM dd),
         |r2 AS (SELECT qid, id, rank FROM rr WHERE rank <= 10),
         |u AS (SELECT qid, id, 1000000 // (60 + rank) AS c FROM r1
         |      UNION ALL SELECT qid, id, 1000000 // (60 + rank) FROM r2),
         |f AS (SELECT qid, id, CAST(sum(c) AS BIGINT) AS rrf_micro,
         |        CAST(count(*) AS BIGINT) AS n_lists FROM u GROUP BY 1, 2),
         |fr AS (SELECT qid, id, rrf_micro, n_lists, row_number() OVER
         |         (PARTITION BY qid ORDER BY rrf_micro DESC, id) AS rank
         |       FROM f)
         |SELECT CAST(qid AS INT) AS qid, CAST(rank AS INT) AS rank, id,
         |  rrf_micro, n_lists
         |FROM fr WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    "q163_incremental_dedup" ->
      """WITH oldc AS (SELECT doc_id AS id, text FROM documents),
        |newc AS (SELECT doc_id + 100000 AS id, text || ' graftmark' AS text
        |         FROM documents WHERE doc_id % 4 = 0),
        |allc AS (SELECT * FROM oldc UNION ALL SELECT * FROM newc),
        |w AS (SELECT id, string_split(text, ' ') AS ws FROM allc),
        |shl AS (SELECT id, [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                    FOR i IN range(1, len(ws) - 1)] AS l FROM w),
        |sh AS (SELECT DISTINCT id, unnest(l) AS sh FROM shl),
        |sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY 1),
        |pairs AS (SELECT n.id AS new_id, o.id AS old_id, count(*) AS inter
        |          FROM sh n JOIN sh o ON n.sh = o.sh
        |          WHERE n.id >= 100000 AND o.id < 100000 GROUP BY 1, 2),
        |j AS (SELECT new_id, old_id,
        |        CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
        |          AS jac
        |      FROM pairs
        |      JOIN sizes sa ON sa.id = pairs.new_id
        |      JOIN sizes sb ON sb.id = pairs.old_id)
        |SELECT new_id, old_id, jac FROM j WHERE jac >= 0.8
        |ORDER BY new_id, old_id""".stripMargin,

    "q164_retrieval_mrr" ->
      s"""WITH $bm25Ctes,
         |gold AS (SELECT qs.qid, d.doc_id AS id
         |  FROM (SELECT DISTINCT qid FROM q) qs, documents d
         |  WHERE d.doc_id % 25 = qs.qid + 7),
         |hit AS (SELECT r.qid, CAST(count(*) AS BIGINT) AS hits,
         |    CAST(min(r.rank) AS BIGINT) AS first_rank
         |  FROM r JOIN gold ON r.qid = gold.qid AND r.id = gold.id
         |  WHERE r.rank <= 10 GROUP BY 1),
         |ng AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_gold
         |       FROM gold GROUP BY 1)
         |SELECT CAST(ng.qid AS INT) AS qid, n_gold,
         |  CAST(coalesce(hits, 0) AS BIGINT) AS hits,
         |  CAST(coalesce(first_rank, 0) AS BIGINT) AS first_rank,
         |  CAST(CASE WHEN first_rank IS NULL THEN 0
         |       ELSE 1000000 // first_rank END AS BIGINT) AS mrr_micro,
         |  CAST((1000 * coalesce(hits, 0)) // n_gold AS BIGINT)
         |    AS recall_milli
         |FROM ng LEFT JOIN hit ON ng.qid = hit.qid ORDER BY qid""".stripMargin,

    "q165_split_leakage" -> {
      val pairsSql = EntryText.jaccardPairsSql(
        graft.fixtures.TextFixtures.nearDupCorpusSql(" graftmark"), 0.8)
      s"""WITH pr AS ($pairsSql),
         |sp AS (SELECT doc_id AS id,
         |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'c'
         |         THEN 0 ELSE 1 END AS split
         |  FROM (${graft.fixtures.TextFixtures.nearDupCorpusSql(" graftmark")}) c)
         |SELECT pr.id_a, pr.id_b, CAST(sa.split AS INT) AS split_a,
         |  CAST(sb.split AS INT) AS split_b
         |FROM pr JOIN sp sa ON sa.id = pr.id_a
         |        JOIN sp sb ON sb.id = pr.id_b
         |WHERE sa.split <> sb.split ORDER BY id_a, id_b""".stripMargin
    }
  )
}
