package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.fixtures.TextFixtures

/** Round-5 forty-second batch: SCD2 dimension build over the recrawl
  * capture feed (validity intervals from digest change points), the text
  * kernels through the SQL front door (Aho–Corasick + Luhn as registered
  * functions in one spark.sql statement), and the dedup yield report
  * (near-dup cluster-size histogram over connected components). */
object EntryRound5ap {

  /** The q105 multi-capture feed: 1 + (doc_id % 3) captures per page a
    * day apart; the 3rd capture rewrites the body (digest change). */
  private def captures(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0L, doc_id % 3)")).as("j"))
      .select(
        concat(lit("https://host"), (col("doc_id") % 97).cast("string"),
          lit(".example.org/doc/"), col("doc_id").cast("string")).as("url"),
        (lit(1600000000L) + col("doc_id") * 137L + col("j") * 86400L)
          .as("ts"),
        when(col("j") === 2, concat(lit("MOD "), col("text")))
          .otherwise(col("text")).as("text"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // type-2 slowly-changing dimension from the capture log: one row per
    // (url, content version) with [valid_from, valid_to] and is_current —
    // the warehouse shape downstream joins consume; change points from a
    // per-url lag(digest) window, versions numbered over the change rows
    "q264_scd2_versions" -> ((s, dir) => {
      val byUrl = Window.partitionBy("url").orderBy("ts")
      val changed = captures(s, dir)
        .withColumn("digest", md5(col("text")))
        .withColumn("pd", lag("digest", 1).over(byUrl))
        .where(col("pd").isNull || col("pd") =!= col("digest"))
      changed
        .withColumn("version", row_number().over(byUrl).cast("int"))
        .withColumn("valid_to", lead("ts", 1).over(byUrl) - 1)
        .select(col("url"), col("version"), col("digest"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.cast("int").as("is_current"))
    }),

    // the text kernels from SQL: one statement runs the one-pass
    // multi-pattern scan AND the Luhn gate — what a safety-review
    // notebook actually types against this engine
    "q265_sql_text_scan" -> ((s, dir) => {
      graft.spark.SqlFunctions.register(s)
      s.read.parquet(s"$dir/documents.parquet")
        .createOrReplaceTempView("q265_docs")
      s.sql("""
        SELECT pos, CAST(sum(c) AS BIGINT) AS n_occurrences,
          CAST(sum(CASE WHEN graft_luhn_valid(
              lpad(CAST((doc_id * 2654435761) % 10000000000000000
                   AS STRING), 16, '0')) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_luhn_valid
        FROM (
          SELECT doc_id,
            posexplode(graft_multi_pattern_counts(text,
              array('filter', 'key', 'big'))) AS (pos, c)
          FROM q265_docs)
        GROUP BY pos""")
    }),

    // dedup yield: how many near-dup clusters of each size the corpus
    // holds — the report every dedup run publishes; cluster membership
    // via the CC operator, then two keyed aggregations
    "q266_dedup_yield" -> ((s, dir) => {
      import graft.text.TextOps
      TextOps.dedupComponents(
          TextFixtures.nearDupCorpus(s, dir, " graftmark near dup copy"),
          "doc_id", "text", n = 3, tau = 0.5)
        .groupBy("rep_id").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
    })
  )

  /** Closed-form captures CTE (the q105 oracle fixture). NB: no line may
    * start with "||" — re-embedded in an outer .stripMargin below. */
  private val capturesSql: String =
    """SELECT concat('https://host', CAST(doc_id % 97 AS VARCHAR),
      |    '.example.org/doc/', CAST(doc_id AS VARCHAR)) AS url,
      |  1600000000 + doc_id * 137 + j * 86400 AS ts,
      |  md5(CASE WHEN j = 2 THEN 'MOD ' || text ELSE text END) AS digest
      |FROM (SELECT doc_id, text, unnest(range(doc_id % 3 + 1)) AS j
      |      FROM documents)""".stripMargin

  def oracles: Map[String, String] = Map(

    "q264_scd2_versions" ->
      s"""WITH cap AS ($capturesSql),
         |l AS (SELECT *, lag(digest) OVER (PARTITION BY url ORDER BY ts)
         |        AS pd FROM cap),
         |v AS (SELECT url, ts, digest FROM l
         |      WHERE pd IS NULL OR pd <> digest)
         |SELECT url,
         |  CAST(row_number() OVER (PARTITION BY url ORDER BY ts) AS INT)
         |    AS version,
         |  digest, CAST(ts AS BIGINT) AS valid_from,
         |  CAST(lead(ts) OVER (PARTITION BY url ORDER BY ts) - 1
         |    AS BIGINT) AS valid_to,
         |  CAST(CASE WHEN lead(ts) OVER (PARTITION BY url ORDER BY ts)
         |       IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
         |FROM v""".stripMargin,

    "q265_sql_text_scan" ->
      """WITH p(pos, pattern) AS (VALUES
        |  (0, 'filter'), (1, 'key'), (2, 'big')),
        |luhn AS (SELECT doc_id,
        |    CASE WHEN (SELECT sum(CASE WHEN i % 2 = 1 THEN
        |          CASE WHEN 2 * dig > 9 THEN 2 * dig - 9 ELSE 2 * dig END
        |        ELSE dig END)
        |      FROM (SELECT i, CAST(substr(lpad(CAST(
        |          (doc_id * 2654435761) % 10000000000000000 AS VARCHAR),
        |          16, '0'), i, 1) AS INT) AS dig
        |        FROM (SELECT unnest(range(1, 17)) AS i) t)) % 10 = 0
        |    THEN 1 ELSE 0 END AS lv
        |  FROM documents),
        |occ AS (SELECT p.pos, d.doc_id,
        |    (length(d.text) - length(replace(d.text, p.pattern, '')))
        |      // length(p.pattern) AS c
        |  FROM documents d, p)
        |SELECT CAST(occ.pos AS INT) AS pos,
        |  CAST(sum(occ.c) AS BIGINT) AS n_occurrences,
        |  CAST(sum(luhn.lv) AS BIGINT) AS n_luhn_valid
        |FROM occ JOIN luhn ON luhn.doc_id = occ.doc_id
        |GROUP BY occ.pos""".stripMargin,

    "q266_dedup_yield" ->
      s"""WITH RECURSIVE
         |nodes AS (SELECT doc_id AS id FROM
         |  (${TextFixtures.nearDupCorpusSql(" graftmark near dup copy")}) c0),
         |p AS (SELECT id_a, id_b FROM (
         |  ${EntryText.jaccardPairsSql(
            TextFixtures.nearDupCorpusSql(" graftmark near dup copy"),
            0.5)}) jp),
         |edges AS (SELECT id_a AS u, id_b AS v FROM p
         |          UNION ALL SELECT id_b AS u, id_a AS v FROM p),
         |r AS (
         |  SELECT id AS u, id AS v FROM nodes
         |  UNION
         |  SELECT r.u, e.v FROM r JOIN edges e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, min(v) AS rep_id FROM r GROUP BY u),
         |sz AS (SELECT rep_id, count(*) AS cluster_size FROM comp
         |       GROUP BY rep_id)
         |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
         |  CAST(count(*) AS BIGINT) AS n_clusters
         |FROM sz GROUP BY cluster_size""".stripMargin
  )
}
