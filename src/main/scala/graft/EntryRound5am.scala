package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 thirty-ninth batch: strongly connected components of the
  * directed link graph (Orzan coloring — the mutual-link-ring audit
  * undirected CC cannot answer), registrable-domain (eTLD+1) extraction
  * with longest-suffix-match against a broadcast public-suffix list, and
  * a Benford first-digit data-quality audit in exact integer arithmetic. */
object EntryRound5am {

  /** Directed fixture: rings of 10 inside each block of ids (last block
    * 90–96 is a ring of 7) + one-way bridges u→u+10 at u%10=3 — ten true
    * SCCs that undirected CC would merge into one component. */
  private def sccEdges(s: SparkSession, dir: String): DataFrame = {
    val nodes = s.read.parquet(s"$dir/documents.parquet")
      .select((col("doc_id") % 97).as("u")).distinct()
    val ring = nodes.select(col("u").as("src"),
      expr("(u - u % 10) + ((u % 10) + 1) % " +
        "(CASE WHEN u >= 90 THEN 7 ELSE 10 END)").as("dst"))
    val bridge = nodes.where(expr("u % 10 = 3 AND u + 10 <= 96"))
      .select(col("u").as("src"), (col("u") + 10).as("dst"))
    ring.unionAll(bridge)
  }

  private val suffixes = Seq(
    "com", "org", "net", "uk", "co.uk", "jp", "ac.jp", "io", "github.io")

  /** Host fixture: subdomain depth, sld, and suffix all derived from
    * doc_id; the co.uk/ac.jp/github.io rows force longest-match. */
  private def hostTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), concat(
        element_at(array(lit("cdn.assets."), lit(""), lit("www.")),
          (col("doc_id") % 3 + 1).cast("int")),
        lit("site"), (col("doc_id") % 23).cast("string"), lit("."),
        element_at(array(lit("org"), lit("net"), lit("co.uk"),
          lit("ac.jp"), lit("github.io"), lit("com")),
          (col("doc_id") % 6 + 1).cast("int"))).as("host"))

  /** Benford expected log10(1+1/d) in 1e9 units — fixed shared constants. */
  private val benfordE9 = Seq(
    1 -> 301029996L, 2 -> 176091259L, 3 -> 124938737L, 4 -> 96910013L,
    5 -> 79181246L, 6 -> 66946790L, 7 -> 57991947L, 8 -> 51152522L,
    9 -> 45757491L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // mutual-link ring detection: ten directed ring SCCs chained by
    // one-way bridges — CC sees one blob, SCC must find all ten; oracle
    // is an independent recursive-closure mutual-reachability in DuckDB
    "q255_scc" -> ((s, dir) =>
      graft.graph.Scc.components(sccEdges(s, dir)).orderBy("id")),

    // per-registrable-domain rollup: longest suffix wins (site5.co.uk
    // groups under co.uk, never uk), www./cdn. mirrors collapse into one
    // domain; the suffix list is the broadcast side, hosts are distinct'd
    // before the theta-join so page volume never touches the matcher
    "q256_etld1" -> ((s, dir) => {
      val withDomain = graft.sources.PublicSuffix.registrable(
        hostTable(s, dir), "host", suffixes)
      withDomain.groupBy("etld1")
        .agg(count(lit(1)).as("n_pages"),
          countDistinct(col("host")).as("n_hosts"))
    }),

    // Benford first-digit audit of the document-length distribution —
    // the cheap "is this column synthetic/corrupt" screen; expected
    // counts and observed/expected ratios in exact integer units so the
    // report is bit-stable (the 9-row window is a driver-sized frame)
    "q257_benford" -> ((s, dir) => {
      import s.implicits._
      val obs = s.read.parquet(s"$dir/documents.parquet")
        .where(col("n_chars") > 0)
        .select(substring(col("n_chars").cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("obs"))
      val consts = benfordE9.toDF("digit", "e9")
      obs.join(broadcast(consts), "digit")
        .withColumn("n", sum(col("obs"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy()))
        .withColumn("exp_n", expr("(n * e9) div 1000000000"))
        .withColumn("ratio_e6", expr("(1000000 * obs) div exp_n"))
        .select(col("digit"), col("obs"), col("exp_n"), col("ratio_e6"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q255_scc" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT DISTINCT doc_id % 97 AS u FROM documents),
        |e AS (
        |  SELECT u AS s, (u - u % 10) + ((u % 10) + 1)
        |      % (CASE WHEN u >= 90 THEN 7 ELSE 10 END) AS t
        |  FROM nodes
        |  UNION ALL
        |  SELECT u, u + 10 FROM nodes WHERE u % 10 = 3 AND u + 10 <= 96),
        |r(s, t) AS (
        |  SELECT s, t FROM e
        |  UNION
        |  SELECT r.s, e.t FROM r JOIN e ON e.s = r.t),
        |mutual AS (
        |  SELECT a.s AS u, a.t AS v FROM r a JOIN r b
        |    ON b.s = a.t AND b.t = a.s)
        |SELECT n.u AS id,
        |  CAST(least(n.u, coalesce(min(m.v), n.u)) AS BIGINT) AS scc
        |FROM nodes n LEFT JOIN mutual m ON m.u = n.u
        |GROUP BY n.u ORDER BY id""".stripMargin,

    "q256_etld1" ->
      """WITH h AS (SELECT doc_id,
        |    (CASE doc_id % 3 WHEN 0 THEN 'cdn.assets.' WHEN 1 THEN ''
        |          ELSE 'www.' END) ||
        |    'site' || CAST(doc_id % 23 AS VARCHAR) || '.' ||
        |    (CASE doc_id % 6 WHEN 0 THEN 'org' WHEN 1 THEN 'net'
        |          WHEN 2 THEN 'co.uk' WHEN 3 THEN 'ac.jp'
        |          WHEN 4 THEN 'github.io' ELSE 'com' END) AS host,
        |    'site' || CAST(doc_id % 23 AS VARCHAR) || '.' ||
        |    (CASE doc_id % 6 WHEN 0 THEN 'org' WHEN 1 THEN 'net'
        |          WHEN 2 THEN 'co.uk' WHEN 3 THEN 'ac.jp'
        |          WHEN 4 THEN 'github.io' ELSE 'com' END) AS etld1
        |  FROM documents)
        |SELECT etld1, CAST(count(*) AS BIGINT) AS n_pages,
        |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
        |FROM h GROUP BY etld1""".stripMargin,

    "q257_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(n_chars AS VARCHAR), 1, 1)
        |      AS INT) AS digit
        |    FROM documents WHERE n_chars > 0),
        |o AS (SELECT digit, count(*) AS obs FROM d GROUP BY 1),
        |c(digit, e9) AS (VALUES
        |  (1, 301029996), (2, 176091259), (3, 124938737), (4, 96910013),
        |  (5, 79181246), (6, 66946790), (7, 57991947), (8, 51152522),
        |  (9, 45757491)),
        |j AS (SELECT o.digit, o.obs, c.e9, sum(o.obs) OVER () AS n
        |      FROM o JOIN c ON c.digit = o.digit)
        |SELECT digit, CAST(obs AS BIGINT) AS obs,
        |  CAST((n * e9) // 1000000000 AS BIGINT) AS exp_n,
        |  CAST((1000000 * obs) // ((n * e9) // 1000000000) AS BIGINT)
        |    AS ratio_e6
        |FROM j""".stripMargin
  )
}
