package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.TpchGeo
import graft.fixtures.TpchGeo.{grid, domain, zres}

/** Round-5 fourteenth batch: rendezvous-hash resharding stability,
  * corridor (buffer) proximity join, and the NOT-EXISTS overlay — each
  * gated by a closed-form DuckDB oracle. */
object EntryRound5n {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // rendezvous hashing: assign every page to 16 shards and to 17, then
    // count movers per original shard — HRW's contract is that a resize
    // moves ~1/17 of keys (a mod-N scheme moves ~16/17); the oracle
    // replays the portable md5 scores and both arg-maxes
    "q190_hrw_resharding" -> ((s, dir) => {
      import graft.operators.Sharding
      val d = s.read.parquet(s"$dir/documents.parquet").select("doc_id")
      d.withColumn("s16", Sharding.hrwShard("doc_id", 16))
        .withColumn("s17", Sharding.hrwShard("doc_id", 17))
        .groupBy(col("s16").as("shard"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("s16") =!= col("s17"), 1L).otherwise(0L))
            .as("n_moved"))
        .orderBy("shard")
    }),

    // corridor join: grid cells whose center lies within 700 units of a
    // road segment — r-expanded bbox cell-cover per segment, exact
    // integer squared-distance filter; the oracle is the naive
    // segments × cells cross join, feasible only at oracle scale
    "q191_corridor_cells" -> ((s, dir) => {
      import graft.operators.Corridor
      val segs = TpchGeo.roads(s, dir).select(
        col("s_suppkey").as("id"),
        element_at(col("line"), 1).as("x1"),
        element_at(col("line"), 2).as("y"),
        element_at(col("line"), 3).as("x2"))
      Corridor.cellsNear(segs, grid, r = 700.0).orderBy("col", "row")
    }),

    // NOT-EXISTS overlay: the points OUTSIDE every mask polygon (q08's
    // complement) through the broadcast cell-cover anti-join — no exact
    // test ever runs for points whose cell holds no mask candidate
    "q192_overlay_anti" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.SpatialJoin
      val mask = Seq(
        Seq(Seq(500.0, 500, 2500, 500, 2500, 2500, 500, 2500)),
        Seq(Seq(5000.0, 1000, 7000, 1000, 7000, 3000, 5000, 3000))
      ).toDF("geom")
      SpatialJoin.overlayPointsAnti(TpchGeo.points(s, dir), mask,
          domain, zres)
        .orderBy("o_orderkey")
    })
  )

  def oracles: Map[String, String] = Map(

    "q190_hrw_resharding" -> {
      val hv = graft.text.WeightedSample.hexValSql(
        "CAST(doc_id AS VARCHAR) || '#' || CAST(sh AS VARCHAR)")
      s"""WITH sc AS (SELECT doc_id, sh, $hv AS v
         |  FROM (SELECT doc_id FROM documents)
         |  CROSS JOIN (SELECT unnest(range(17)) AS sh)),
         |a16 AS (SELECT doc_id, sh AS s16 FROM
         |  (SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id
         |     ORDER BY v DESC, sh) AS rn FROM sc WHERE sh < 16)
         |  WHERE rn = 1),
         |a17 AS (SELECT doc_id, sh AS s17 FROM
         |  (SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id
         |     ORDER BY v DESC, sh) AS rn FROM sc)
         |  WHERE rn = 1)
         |SELECT CAST(s16 AS INT) AS shard, count(*) AS n_keys,
         |  CAST(sum(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_moved
         |FROM a16 JOIN a17 USING (doc_id)
         |GROUP BY 1 ORDER BY shard""".stripMargin
    },

    "q191_corridor_cells" ->
      s"""WITH rd AS (${TpchGeo.roadsSql}),
         |cl AS (${TpchGeo.cellsSql}),
         |d AS (SELECT col, "row",
         |        greatest(0, x1 - (gx0 + 500), (gx0 + 500) - x2) AS dx,
         |        abs((gy0 + 500) - y) AS dy
         |      FROM rd CROSS JOIN cl)
         |SELECT col, "row", count(*) AS n_segs,
         |  CAST(min(dx*dx + dy*dy) AS BIGINT) AS min_d2
         |FROM d WHERE dx*dx + dy*dy <= 490000
         |GROUP BY 1, 2 ORDER BY col, "row"""".stripMargin,

    "q192_overlay_anti" ->
      s"""WITH pts AS (${TpchGeo.pointsSql})
         |SELECT o_orderkey, x, y FROM pts
         |WHERE NOT ((x > 500 AND x < 2500 AND y > 500 AND y < 2500)
         |        OR (x > 5000 AND x < 7000 AND y > 1000 AND y < 3000))
         |ORDER BY o_orderkey""".stripMargin
  )
}
