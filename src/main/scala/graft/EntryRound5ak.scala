package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.Pages

/** Round-5 thirty-seventh batch: the SQL front door for the native
  * kernels (graft_cell_encode / graft_pip_status registered in the
  * session function registry and driven from `spark.sql`), CUSUM
  * change-point detection over daily event-type series via the exact
  * prefix-min identity (windows only — no recursion), and the local
  * clustering coefficient over the link graph (degree-ordered wedges). */
object EntryRound5ak {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the SQL surface: the SAME codegen'd Catalyst kernels the DataFrame
    // API plans (CellEncodeExpr, PointInPolygonStatus) invoked through
    // the session function registry from a plain spark.sql string — the
    // notebook/thrift path a reference user would migrate their
    // srgcreate argv scripts to; oracle re-derives the morton bits and
    // the diamond point-in-polygon test in closed form
    "q249_sql_surface" -> ((s, dir) => {
      graft.spark.SqlFunctions.register(s)
      Pages.geotag(Pages.pages(s, dir))
        .createOrReplaceTempView("q249_geo_pages")
      s.sql("""
        SELECT graft_cell_encode(x, y, 0.0D, 0.0D, 8000.0D, 8000.0D, 4)
                 AS cell,
               graft_pip_status(x, y, array(array(
                 2000.0D, 4000.0D, 4000.0D, 2000.0D,
                 6000.0D, 4000.0D, 4000.0D, 6000.0D))) AS pip,
               count(*) AS n
        FROM q249_geo_pages GROUP BY 1, 2""")
    }),

    // drift monitor: per-event-type daily counts → CUSUM in exact
    // integer units (dev scaled by series length), alarm when the
    // cumulative excess tops a quarter of the series total — three
    // window functions over one (type ORDER BY day) frame, so a
    // 10^8-key corpus runs it with a single shuffle by key
    "q250_cusum_changepoint" -> ((s, dir) => {
      val daily = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000")
            .as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
      graft.operators.Changepoint.cusum(
        daily, "event_type", "day", "cnt", num = 1, denom = 4)
    }),

    // community-vs-directory audit over the q150 closed-form link graph:
    // per-node degree, triangle count, and clustering coefficient in
    // exact micro-units — the wedge join stays O(√m)-bounded per node
    "q251_clustering_coeff" -> ((s, dir) => {
      val edges = s.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          explode(array(lit(7919L), lit(15838L), lit(23757L))).as("p"))
        .select((col("doc_id") % 97).as("src"),
          ((col("doc_id") * 31 + col("p")) % 97).as("dst"))
      graft.graph.Triangles.clusteringCoeff(edges)
        .orderBy("id")
    })
  )

  def oracles: Map[String, String] = Map(

    "q249_sql_surface" ->
      s"""WITH pg AS (${Pages.geotaggedSql}),
         |c AS (SELECT CAST(floor(x / 500) AS BIGINT) AS ix,
         |        CAST(floor(y / 500) AS BIGINT) AS iy,
         |        CASE WHEN abs(x - 4000) + abs(y - 4000) <= 2000
         |             THEN 1 ELSE 0 END AS pip
         |      FROM pg),
         |m AS (SELECT
         |    ((ix & 1) | ((ix & 2) << 1) | ((ix & 4) << 2)
         |      | ((ix & 8) << 3)) AS mx,
         |    ((iy & 1) | ((iy & 2) << 1) | ((iy & 4) << 2)
         |      | ((iy & 8) << 3)) AS my,
         |    pip FROM c)
         |SELECT CAST((CAST(4 AS BIGINT) << 58) | mx | (my << 1) AS BIGINT)
         |    AS cell,
         |  CAST(pip AS INT) AS pip, CAST(count(*) AS BIGINT) AS n
         |FROM m GROUP BY 1, 2""".stripMargin,

    "q250_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |k AS (SELECT event_type, day, cnt,
        |    count(*) OVER (PARTITION BY event_type) AS d,
        |    sum(cnt) OVER (PARTITION BY event_type) AS tot
        |  FROM daily),
        |pf0 AS (SELECT *, sum(cnt * d - tot) OVER w AS pf
        |  FROM k
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (SELECT *, min(pf) OVER (PARTITION BY event_type
        |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS mn
        |  FROM pf0)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |  CAST(cnt AS BIGINT) AS cnt,
        |  CAST(pf - least(0, mn) AS BIGINT) AS cusum,
        |  CAST(CASE WHEN (pf - least(0, mn)) * 4 > tot * 1
        |       THEN 1 ELSE 0 END AS INT) AS alarm
        |FROM p""".stripMargin,

    "q251_clustering_coeff" ->
      """WITH e0 AS (SELECT DISTINCT doc_id % 97 AS a, (doc_id*31 + p) % 97
        |      AS b
        |  FROM documents, (SELECT unnest([7919, 15838, 23757]) AS p)
        |  WHERE doc_id % 5 <> 0),
        |e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        |      FROM e0 WHERE a <> b),
        |deg AS (SELECT id, count(*) AS deg FROM
        |    (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY id),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |m AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
        |      UNION ALL SELECT z FROM tri),
        |tc AS (SELECT id, count(*) AS n_tri FROM m GROUP BY id)
        |SELECT deg.id, CAST(deg.deg AS BIGINT) AS deg,
        |  CAST(coalesce(tc.n_tri, 0) AS BIGINT) AS n_tri,
        |  CAST(CASE WHEN deg.deg >= 2 THEN
        |      (2000000 * coalesce(tc.n_tri, 0)) // (deg.deg * (deg.deg - 1))
        |    ELSE 0 END AS BIGINT) AS cc_e6
        |FROM deg LEFT JOIN tc ON tc.id = deg.id
        |ORDER BY deg.id""".stripMargin
  )
}
