package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 forty-third batch: the graph distance profile via multi-source
  * bitset BFS (64 landmarks in one long per node), a k-anonymity audit
  * over quasi-identifier groups (the privacy screen before release), and
  * link-graph reciprocity (mutual-edge fraction in exact micro-units). */
object EntryRound5aq {

  /** The q255 block-ring + one-way-bridge digraph: long shortest paths
    * (landmark eccentricities up to ~5 blocks) with real unreachability. */
  private def chainEdges(s: SparkSession, dir: String): DataFrame = {
    val nodes = s.read.parquet(s"$dir/documents.parquet")
      .select((col("doc_id") % 97).as("u")).distinct()
    val ring = nodes.select(col("u").as("src"),
      expr("(u - u % 10) + ((u % 10) + 1) % " +
        "(CASE WHEN u >= 90 THEN 7 ELSE 10 END)").as("dst"))
    val bridge = nodes.where(expr("u % 10 = 3 AND u + 10 <= 96"))
      .select(col("u").as("src"), (col("u") + 10).as("dst"))
    ring.unionAll(bridge)
  }

  private val landmarks = Seq(0L, 13L, 26L, 39L, 52L, 65L, 78L, 91L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // distance profile: N(t) = reachable (landmark, node) pairs within t
    // hops, 8 landmarks riding one bitset long per node — one bit_or
    // aggregate per round instead of 8 BFS jobs; the oracle recomputes
    // min-distances per landmark with a recursive closure
    "q267_neighborhood_fn" -> ((s, dir) =>
      graft.graph.MultiBfs.neighborhoodFunction(
        chainEdges(s, dir), landmarks)),

    // k-anonymity: quasi-identifier groups (lang, source, length bucket)
    // with group sizes and a k=5 violation flag — the re-identification
    // screen a dataset release card cites; one keyed aggregate
    "q268_k_anonymity" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 100").as("len_bucket"))
        .agg(count(lit(1)).as("group_n"))
        .withColumn("violates_k5", (col("group_n") < 5).cast("int"))),

    // reciprocity: the fraction of directed links whose reverse edge
    // exists — the mutual-citation signal; one self-equi-join on the
    // canonical edge key, exact 1e6-unit division
    "q269_reciprocity" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/documents.parquet")
        .select((col("doc_id") % 97).as("src"),
          expr("(doc_id * 31 + 7) % 97").as("dst"))
        .where(col("src") =!= col("dst")).distinct()
      val rev = e.select(col("dst").as("src"), col("src").as("dst"))
      val recip = e.intersect(rev)
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(recip.agg(count(lit(1)).as("n_reciprocal")))
        .withColumn("reciprocity_e6",
          expr("(1000000 * n_reciprocal) div n_edges"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q267_neighborhood_fn" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT DISTINCT doc_id % 97 AS u FROM documents),
        |e AS (
        |  SELECT u AS s, (u - u % 10) + ((u % 10) + 1)
        |      % (CASE WHEN u >= 90 THEN 7 ELSE 10 END) AS t
        |  FROM nodes
        |  UNION ALL
        |  SELECT u, u + 10 FROM nodes WHERE u % 10 = 3 AND u + 10 <= 96),
        |lm(s) AS (VALUES (0), (13), (26), (39), (52), (65), (78), (91)),
        |r(s, v, d) AS (
        |  SELECT s, s, 0 FROM lm
        |  UNION
        |  SELECT r.s, e.t, r.d + 1 FROM r JOIN e ON e.s = r.v
        |  WHERE r.d < 96),
        |mind AS (SELECT s, v, min(d) AS d FROM r GROUP BY 1, 2),
        |ts AS (SELECT unnest(range(0, (SELECT max(d) + 1 FROM mind)))
        |         AS t)
        |SELECT CAST(ts.t AS BIGINT) AS t,
        |  CAST((SELECT count(*) FROM mind WHERE mind.d <= ts.t)
        |    AS BIGINT) AS n_pairs
        |FROM ts""".stripMargin,

    "q268_k_anonymity" ->
      """SELECT lang, source, n_chars // 100 AS len_bucket,
        |  CAST(count(*) AS BIGINT) AS group_n,
        |  CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS INT)
        |    AS violates_k5
        |FROM documents GROUP BY 1, 2, 3""".stripMargin,

    "q269_reciprocity" ->
      """WITH e AS (SELECT DISTINCT doc_id % 97 AS src,
        |    (doc_id * 31 + 7) % 97 AS dst
        |  FROM documents WHERE doc_id % 97 <> (doc_id * 31 + 7) % 97),
        |r AS (SELECT count(*) AS n_reciprocal FROM e a
        |      JOIN e b ON b.src = a.dst AND b.dst = a.src),
        |n AS (SELECT count(*) AS n_edges FROM e)
        |SELECT CAST(n_edges AS BIGINT) AS n_edges,
        |  CAST(n_reciprocal AS BIGINT) AS n_reciprocal,
        |  CAST((1000000 * n_reciprocal) // n_edges AS BIGINT)
        |    AS reciprocity_e6
        |FROM n, r""".stripMargin
  )
}
