package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Round-5 twenty-third batch: community-quality scoring (exact integer
  * modularity over the q178 LPA communities) and pointer-doubling
  * redirect resolution — each gated by a closed-form DuckDB oracle. */
object EntryRound5w {

  /** q178's deterministic two-block graph (same-parity edges + planted
    * bridges) — shared by the LPA query and the modularity scorer. */
  private def lpaEdges(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val intra = d.select(
      ((col("doc_id") * 13) % 40 * 2 + col("doc_id") % 2).as("src"),
      (((col("doc_id") * 29 + 7) % 40) * 2 + col("doc_id") % 2).as("dst"))
    val bridges = d.where(col("doc_id") % 101 === 0).select(
      ((col("doc_id") * 13) % 40 * 2).as("src"),
      (((col("doc_id") * 29 + 7) % 40) * 2 + 1).as("dst"))
    intra.unionByName(bridges)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact integer modularity of the q178 communities: per community c,
    // contrib_num = 4·m·e_c − d_c² over denominator 4m² (never divided —
    // the ladder stays integer; Q = Σ contrib_num / 4m²). e_c/d_c/m come
    // from three keyed aggregations over the deduped symmetric edge set.
    "q211_community_modularity" -> ((s, dir) => {
      import graft.graph.LabelProp
      val edges = lpaEdges(s, dir)
      val labels = LabelProp.propagate(edges, rounds = 4)
      val und = edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .where(col("src") =!= col("dst"))
      val sym = und.unionByName(
          und.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .transform(graft.spark.PersistTracker.persist)
      val ue = sym.where(col("src") < col("dst"))
      val m = ue.agg(count(lit(1))).head().getLong(0) // 1-row scalar
      val deg = sym.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("dg"))
      val la = labels.select(col("id").as("src"), col("lab"))
      val lb = labels.select(col("id").as("dst"), col("lab").as("lab_b"))
      val intra = ue.join(la, "src").join(lb, "dst")
        .where(col("lab") === col("lab_b"))
        .groupBy("lab").agg(count(lit(1)).as("e_intra"))
      labels.join(deg, "id")
        .groupBy("lab")
        .agg(count(lit(1)).as("n_nodes"), sum("dg").as("d_sum"))
        .join(intra, Seq("lab"), "left")
        .withColumn("e_intra", coalesce(col("e_intra"), lit(0L)))
        .withColumn("contrib_num",
          lit(4L) * m * col("e_intra") - col("d_sum") * col("d_sum"))
        .select("lab", "n_nodes", "e_intra", "d_sum", "contrib_num")
        .orderBy("lab")
    }),

    // redirect-chain resolution by pointer doubling: every redirecting
    // url jumps to its FINAL target in ⌈log₂ L⌉ self-joins (f ← f∘f),
    // not L hops — the canonical-capture step after 301-chain crawling.
    // The fixture halves ids (strictly decreasing ⇒ acyclic); the oracle
    // follows the chains with a RECURSIVE CTE.
    "q212_redirect_resolve" -> ((s, dir) => {
      import graft.graph.PointerDoubling
      val ptr = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 3 === 0 && col("doc_id") > 0)
        .select(col("doc_id").as("src"),
          expr("doc_id div 2").as("dst"))
      PointerDoubling.resolve(ptr)
        .select(col("src"), col("dst").as("terminal"))
        .orderBy("src")
    })
  )

  def oracles: Map[String, String] = Map(

    "q211_community_modularity" ->
      """WITH e0 AS (
        |  SELECT (doc_id * 13) % 40 * 2 + doc_id % 2 AS src,
        |         ((doc_id * 29 + 7) % 40) * 2 + doc_id % 2 AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT (doc_id * 13) % 40 * 2,
        |         ((doc_id * 29 + 7) % 40) * 2 + 1
        |  FROM documents WHERE doc_id % 101 = 0),
        |e1 AS (SELECT src, dst FROM e0 WHERE src <> dst),
        |e AS (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM e1 UNION ALL SELECT dst, src FROM e1)),
        |l0 AS (SELECT DISTINCT src AS id, src AS lab FROM e),
        |v1 AS (SELECT e.dst AS id, l.lab, count(*) AS c
        |       FROM e JOIN l0 l ON e.src = l.id GROUP BY 1, 2),
        |l1 AS (SELECT id, lab FROM (SELECT id, lab,
        |         row_number() OVER (PARTITION BY id
        |           ORDER BY c DESC, lab ASC) AS rn FROM v1) WHERE rn = 1),
        |v2 AS (SELECT e.dst AS id, l.lab, count(*) AS c
        |       FROM e JOIN l1 l ON e.src = l.id GROUP BY 1, 2),
        |l2 AS (SELECT id, lab FROM (SELECT id, lab,
        |         row_number() OVER (PARTITION BY id
        |           ORDER BY c DESC, lab ASC) AS rn FROM v2) WHERE rn = 1),
        |v3 AS (SELECT e.dst AS id, l.lab, count(*) AS c
        |       FROM e JOIN l2 l ON e.src = l.id GROUP BY 1, 2),
        |l3 AS (SELECT id, lab FROM (SELECT id, lab,
        |         row_number() OVER (PARTITION BY id
        |           ORDER BY c DESC, lab ASC) AS rn FROM v3) WHERE rn = 1),
        |v4 AS (SELECT e.dst AS id, l.lab, count(*) AS c
        |       FROM e JOIN l3 l ON e.src = l.id GROUP BY 1, 2),
        |l4 AS (SELECT id, lab FROM (SELECT id, lab,
        |         row_number() OVER (PARTITION BY id
        |           ORDER BY c DESC, lab ASC) AS rn FROM v4) WHERE rn = 1),
        |deg AS (SELECT src AS id, count(*) AS dg FROM e GROUP BY 1),
        |ue AS (SELECT src, dst FROM e WHERE src < dst),
        |mm AS (SELECT count(*) AS m FROM ue),
        |intra AS (SELECT la.lab, count(*) AS ec
        |          FROM ue JOIN l4 la ON ue.src = la.id
        |          JOIN l4 lb ON ue.dst = lb.id AND la.lab = lb.lab
        |          GROUP BY 1),
        |ds AS (SELECT l4.lab, count(*) AS nn, sum(dg) AS dc
        |       FROM l4 JOIN deg USING (id) GROUP BY 1)
        |SELECT CAST(ds.lab AS BIGINT) AS lab, CAST(nn AS BIGINT) AS n_nodes,
        |  CAST(coalesce(ec, 0) AS BIGINT) AS e_intra,
        |  CAST(dc AS BIGINT) AS d_sum,
        |  CAST(4 * m * coalesce(ec, 0) - dc * dc AS BIGINT) AS contrib_num
        |FROM ds LEFT JOIN intra ON ds.lab = intra.lab CROSS JOIN mm
        |ORDER BY lab""".stripMargin,

    "q212_redirect_resolve" ->
      """WITH RECURSIVE p AS (
        |  SELECT doc_id AS src, doc_id // 2 AS dst FROM documents
        |  WHERE doc_id % 3 = 0 AND doc_id > 0),
        |r AS (SELECT src, dst FROM p
        |      UNION ALL
        |      SELECT r.src, p.dst FROM r JOIN p ON r.dst = p.src)
        |SELECT src, dst AS terminal FROM r
        |WHERE dst NOT IN (SELECT src FROM p)
        |ORDER BY src""".stripMargin
  )
}
