package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprBridge
import graft.spark.expressions.{LuhnValid, MultiPatternCounts}

/** Round-5 fortieth batch: one-pass Aho–Corasick blocklist scanning (T
  * patterns, one text traversal, codegen via addReferenceObj), Luhn-gated
  * PII candidate validation (the checksum that separates card numbers
  * from arbitrary digit strings), and co-citation domain pairs (hosts
  * cited together by the same page — the "related domains" graph signal). */
object EntryRound5an {

  /** Border-free patterns (no proper prefix = suffix), so the overlap-
    * inclusive AC counts equal DuckDB's non-overlapping replace() counts;
    * "par" is a strict substring of corpus words (part, spark) to prove
    * substring—not token—matching. */
  private val patterns = Seq("data", "spark", "par", "row", "scan")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // safety blocklist scan: per-pattern corpus occurrence totals and
    // doc frequencies from ONE pass per document (the 50-term blocklist
    // costs one traversal, not 50 regexp scans); the automaton rides the
    // generated code as a reference object, rows never leave codegen
    "q258_blocklist_scan" -> ((s, dir) => {
      val cnts = ExprBridge.column(MultiPatternCounts(
        ExprBridge.expression(col("text")), patterns))
      val patNames = array(patterns.map(lit): _*)
      s.read.parquet(s"$dir/documents.parquet")
        .select(posexplode(cnts).as(Seq("pos", "c")))
        .groupBy("pos")
        .agg(sum(col("c")).as("n_occurrences"),
          sum((col("c") > 0).cast("long")).as("n_docs"))
        .select(element_at(patNames, col("pos") + 1).as("pattern"),
          col("n_occurrences"), col("n_docs"))
    }),

    // PII validity gate: 16-digit candidates synthesized from doc ids;
    // Luhn mod-10 decides which are redactable card numbers vs noise —
    // per-host candidate/valid counts (a narrow codegen map + group-by)
    "q259_luhn_pii" -> ((s, dir) => {
      val cc = lpad(expr(
        "CAST((doc_id * 2654435761) % 10000000000000000 AS STRING)"),
        16, "0")
      s.read.parquet(s"$dir/documents.parquet")
        .select((col("doc_id") % 97).as("host"),
          ExprBridge.column(LuhnValid(ExprBridge.expression(cc))).as("v"))
        .groupBy("host")
        .agg(count(lit(1)).as("n_candidates"),
          sum(col("v").cast("long")).as("n_valid"))
    }),

    // co-citation: hosts linked from the same page, counted over
    // unordered pairs — a bounded per-page self-join (≤ 3 links/page ⇒
    // ≤ 3 pairs/page), never a host×host product
    "q260_cocitation" -> ((s, dir) => {
      val links = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), explode(array(
          expr("(doc_id * 31 + 7) % 97"),
          expr("(doc_id * 17 + 23) % 97"),
          expr("(doc_id * 53 + 41) % 97"))).as("h"))
        .distinct()
      val a = links.withColumnRenamed("h", "host_a")
      val b = links.withColumnRenamed("h", "host_b")
      a.join(b, "doc_id")
        .where(col("host_a") < col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(count(lit(1)).as("n_pages"))
        .where(col("n_pages") >= 2)
    })
  )

  def oracles: Map[String, String] = Map(

    "q258_blocklist_scan" ->
      """WITH p(pattern) AS (VALUES
        |  ('data'), ('spark'), ('par'), ('row'), ('scan')),
        |occ AS (SELECT p.pattern,
        |    (length(d.text) - length(replace(d.text, p.pattern, '')))
        |      // length(p.pattern) AS c
        |  FROM documents d, p)
        |SELECT pattern, CAST(sum(c) AS BIGINT) AS n_occurrences,
        |  CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
        |FROM occ GROUP BY pattern""".stripMargin,

    "q259_luhn_pii" ->
      """WITH c AS (SELECT doc_id % 97 AS host,
        |    lpad(CAST((doc_id * 2654435761) % 10000000000000000
        |      AS VARCHAR), 16, '0') AS cc
        |  FROM documents),
        |s AS (SELECT host, cc,
        |    sum(CASE WHEN i % 2 = 1 THEN
        |          CASE WHEN 2 * dig > 9 THEN 2 * dig - 9 ELSE 2 * dig END
        |        ELSE dig END) AS lsum
        |  FROM (SELECT host, cc, i, CAST(substr(cc, i, 1) AS INT) AS dig
        |        FROM c, (SELECT unnest(range(1, 17)) AS i) t)
        |  GROUP BY host, cc)
        |SELECT host, CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(CASE WHEN lsum % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_valid
        |FROM s GROUP BY host""".stripMargin,

    "q260_cocitation" ->
      """WITH links AS (SELECT DISTINCT doc_id, h FROM (
        |    SELECT doc_id, unnest([
        |      (doc_id * 31 + 7) % 97,
        |      (doc_id * 17 + 23) % 97,
        |      (doc_id * 53 + 41) % 97]) AS h
        |    FROM documents))
        |SELECT a.h AS host_a, b.h AS host_b,
        |  CAST(count(*) AS BIGINT) AS n_pages
        |FROM links a JOIN links b
        |  ON b.doc_id = a.doc_id AND a.h < b.h
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin
  )
}
