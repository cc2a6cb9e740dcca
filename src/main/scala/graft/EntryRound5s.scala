package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.TpchGeo
import graft.fixtures.TpchGeo.{domain, zres}

/** Round-5 nineteenth batch: per-cell nearest-feature distance map,
  * map-matching point-to-segment snap, and weighted exact percentiles —
  * each gated by a closed-form DuckDB oracle. */
object EntryRound5s {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // proximity-allocation raster: every grid cell's nearest site and
    // squared distance through the k-ring expanding kNN (k=1, queries =
    // the 64 cell centers) — the distance-transform input the reference's
    // nearest-feature allocation mode consumes
    "q202_cell_distance_map" -> ((s, dir) => {
      import graft.operators.Knn
      val centers = s.range(64).select(col("id").as("qid"),
        expr("CAST(id % 8 AS DOUBLE) * 1000.0 + 500.0").as("x"),
        expr("CAST(id div 8 AS DOUBLE) * 1000.0 + 500.0").as("y"))
      Knn.knnJoin(centers, TpchGeo.knnSites(s, dir), k = 1, domain, zres)
        .select(expr("CAST(qid % 8 + 1 AS INT)").as("col"),
          expr("CAST(qid div 8 + 1 AS INT)").as("row"),
          col("sid"), col("dist2"))
        .orderBy("col", "row")
    }),

    // map matching: every 23rd page point snapped to its nearest road
    // segment within 400 units (ties → smaller segment id) via the
    // bucketed candidate join — never points × segments; unmatched
    // points emit nothing
    "q203_point_snap" -> ((s, dir) => {
      import graft.operators.Corridor
      val pts = TpchGeo.points(s, dir)
        .where(col("o_orderkey") % 23 === 0)
        .select(col("o_orderkey").as("pid"), col("x"), col("y"))
      val segs = TpchGeo.roads(s, dir).select(
        col("s_suppkey").as("id"),
        element_at(col("line"), 1).as("x1"),
        element_at(col("line"), 3).as("x2"),
        element_at(col("line"), 2).as("sy"))
      Corridor.snapPoints(pts, segs, bucket = 1000.0, r = 400.0)
        .orderBy("pid")
    }),

    // weighted exact percentiles: per language, doc-length median and
    // p90 where each document weighs its WORD COUNT — the robust
    // "typical length seen by the tokenizer" statistic, vs q123's
    // row-weighted one
    "q204_weighted_percentiles" -> ((s, dir) => {
      import graft.text.WeightedStats
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_words"))
      WeightedStats.weightedPercentiles(d, "lang", "n_chars", "n_words",
          "doc_id", Seq(50, 90))
        .select(col("g").as("lang"), col("total_w"),
          col("p50_w"), col("p90_w"))
        .orderBy("lang")
    })
  )

  def oracles: Map[String, String] = Map(

    "q202_cell_distance_map" ->
      """WITH q AS (SELECT c % 8 + 1 AS col, c // 8 + 1 AS "row",
        |    (c % 8) * 1000.0 + 500 AS x, (c // 8) * 1000.0 + 500 AS y
        |  FROM range(64) t(c)),
        |s AS (SELECT s_suppkey AS sid,
        |    CAST((s_suppkey*27179) % 8000 AS DOUBLE) AS sx,
        |    CAST((s_suppkey*15101) % 8000 AS DOUBLE) AS sy
        |  FROM supplier),
        |d AS (SELECT col, "row", sid,
        |        (x-sx)*(x-sx)+(y-sy)*(y-sy) AS dist2
        |      FROM q CROSS JOIN s),
        |r AS (SELECT col, "row", sid, dist2,
        |    row_number() OVER (PARTITION BY col, "row"
        |      ORDER BY dist2, sid) AS rn FROM d)
        |SELECT CAST(col AS INT) AS col, CAST("row" AS INT) AS "row",
        |  sid, dist2
        |FROM r WHERE rn = 1 ORDER BY col, "row"""".stripMargin,

    "q203_point_snap" ->
      s"""WITH pts AS (${TpchGeo.pointsSql}),
         |p AS (SELECT o_orderkey AS pid, x, y FROM pts
         |      WHERE o_orderkey % 23 = 0),
         |rd AS (${TpchGeo.roadsSql}),
         |d AS (SELECT p.pid, rd.s_suppkey AS id,
         |        greatest(0, rd.x1 - p.x, p.x - rd.x2) AS dx,
         |        abs(p.y - rd.y) AS dy
         |      FROM p CROSS JOIN rd),
         |f AS (SELECT pid, id, dx*dx + dy*dy AS d2 FROM d
         |      WHERE dx*dx + dy*dy <= 160000),
         |r AS (SELECT pid, id, d2,
         |    row_number() OVER (PARTITION BY pid ORDER BY d2, id) AS rn
         |  FROM f)
         |SELECT pid, id AS seg_id, CAST(d2 AS BIGINT) AS d2
         |FROM r WHERE rn = 1 ORDER BY pid""".stripMargin,

    "q204_weighted_percentiles" ->
      """WITH d AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS v,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w
        |  FROM documents),
        |c AS (SELECT lang, v, w, doc_id,
        |    sum(w) OVER (PARTITION BY lang ORDER BY v, doc_id) AS cw,
        |    sum(w) OVER (PARTITION BY lang) AS tw FROM d)
        |SELECT lang, CAST(max(tw) AS BIGINT) AS total_w,
        |  CAST(min(CASE WHEN cw >= (tw * 50 + 99) // 100 THEN v END)
        |    AS BIGINT) AS p50_w,
        |  CAST(min(CASE WHEN cw >= (tw * 90 + 99) // 100 THEN v END)
        |    AS BIGINT) AS p90_w
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin
  )
}
