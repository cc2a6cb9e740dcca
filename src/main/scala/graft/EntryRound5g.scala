package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 seventh batch: search-snippet extraction over the BM25 top-k
  * and reproducible weighted sampling — each with a closed-form DuckDB
  * oracle. */
object EntryRound5g {

  private val bmQueries = Seq(
    0 -> Seq("table", "scan", "join"),
    1 -> Seq("window", "data"),
    2 -> Seq("customer", "value", "fast", "slow"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // result highlighting: for each (query, top-3 BM25 doc) the 8-token
    // window with the most query-term hits (ties -> earliest), plus the
    // reconstructed snippet text; corpus semi-joined to the top-k first,
    // argmax via keyed struct-min (no rank window anywhere)
    "q166_snippets" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val topk = graft.text.CrawlOps.bm25TopK(docs, "doc_id", "text",
        queries = bmQueries, k = 3)
      graft.text.Snippets.bestWindows(docs, "doc_id", "text",
          topk.select(col("qid"), col("id")), bmQueries, width = 8)
        .orderBy("qid", "id")
    }),

    // reproducible weighted sampling (Efraimidis-Sprites): top-50 docs by
    // the quality-weight key ln(u)/w with a content-free md5-derived
    // uniform, quantized to micro-units — the auditable data-mixing draw;
    // rank via the salted two-phase top-k
    "q167_weighted_sample" -> ((s, dir) =>
      graft.text.WeightedSample.topKWeighted(
          s.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", k = 50)
        .orderBy("rank"))
  )

  /** Same BM25 chain as q151/q162/q164 (EntryRound5f.bm25Ctes is private —
    * duplicated here verbatim; the chain is the shared oracle contract). */
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

    "q166_snippets" ->
      s"""WITH $bm25Ctes,
         |t3 AS (SELECT qid, id FROM r WHERE rank <= 3),
         |wsx AS (SELECT doc_id AS id, string_split(text, ' ') AS toks
         |        FROM documents WHERE doc_id IN (SELECT id FROM t3)),
         |tk AS (SELECT id, len(toks) AS n,
         |         generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS w
         |       FROM wsx),
         |qp AS (SELECT q.qid, tk.id, tk.pos AS p FROM tk JOIN q ON tk.w = q.w),
         |st AS (SELECT id, pos AS st FROM tk
         |       WHERE pos <= greatest(n - 8, 0)),
         |scq AS (SELECT qp.qid, qp.id, st.st, count(*) AS n_hits
         |  FROM qp JOIN st ON qp.id = st.id
         |    AND qp.p >= st.st AND qp.p < st.st + 8
         |  GROUP BY 1, 2, 3),
         |b AS (SELECT qid, id, st, n_hits, row_number() OVER
         |        (PARTITION BY qid, id ORDER BY n_hits DESC, st) AS rn
         |      FROM scq),
         |fin AS (SELECT b.qid, b.id, b.st, b.n_hits FROM b
         |        JOIN t3 ON b.qid = t3.qid AND b.id = t3.id WHERE rn = 1)
         |SELECT CAST(fin.qid AS INT) AS qid, fin.id,
         |  CAST(st AS BIGINT) AS start, CAST(n_hits AS BIGINT) AS n_hits,
         |  array_to_string(wsx.toks[st + 1 : st + 8], ' ') AS snippet
         |FROM fin JOIN wsx ON wsx.id = fin.id ORDER BY qid, fin.id""".stripMargin,

    "q167_weighted_sample" -> {
      val hv = graft.text.WeightedSample.hexValSql("doc_id")
      s"""WITH kx AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS w,
         |    CAST(round(1000000.0 * ln(($hv + 1) / 16777216.0)
         |      / CAST(n_chars AS DOUBLE)) AS BIGINT) AS key_micro
         |  FROM documents WHERE n_chars > 0),
         |r AS (SELECT id, w, key_micro, row_number() OVER
         |        (ORDER BY key_micro DESC, id) AS rank FROM kx)
         |SELECT CAST(rank AS INT) AS rank, id, w, key_micro FROM r
         |WHERE rank <= 50 ORDER BY rank""".stripMargin
    }
  )
}
