package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.{TpchGeo, Pages}

/** Round-5 twenty-first batch: network distance derived purely from
  * geometry (shared-edge adjacency → shortest paths), and the
  * spatiotemporal cube over geotagged pages — each gated by a
  * closed-form DuckDB oracle. */
object EntryRound5u {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // geometry → graph → shortest path: build the county adjacency graph
    // FROM THE RINGS (q193's operator), run unit-weight shortest paths
    // from the corner county — on the 4×4 rook lattice the answer is the
    // Manhattan distance, which is exactly what the oracle predicts
    // without ever seeing an edge
    "q207_network_distance" -> ((s, dir) => {
      import graft.operators.Topology
      import graft.graph.Sssp
      val adj = Topology.edgeAdjacency(TpchGeo.counties(s), "fips", "geom")
      // fips '47NNN' → integer node id; symmetric unit edges
      def nid(name: String) = expr(s"CAST(substr($name, 3) AS BIGINT)")
      val edges = adj.select(nid("id_a").as("src"), nid("id_b").as("dst"))
        .unionByName(adj.select(nid("id_b").as("src"),
          nid("id_a").as("dst")))
        .withColumn("w", lit(1L))
      val seeds = s.range(1).select((col("id") + 1).as("id"))
      Sssp.distances(edges, seeds, maxRounds = 8)
        .select(concat(lit("47"), lpad(col("id").cast("string"), 3, "0"))
          .as("fips"), col("dist").cast("long").as("hops"))
        .orderBy("fips")
    }),

    // spatiotemporal cube: geotagged pages × capture day, with ROLLUP
    // margins (per cell-day, per cell, grand total) — the space×time
    // OLAP face of the tile pyramid
    "q208_spacetime_cube" -> ((s, dir) => {
      val g = Pages.geotag(Pages.pages(s, dir))
        .select(
          (floor(col("x") / 1000.0) + 1).cast("int").as("col"),
          (floor(col("y") / 1000.0) + 1).cast("int").as("row"),
          floor(unix_timestamp(col("warc_ts")) / 86400L).cast("long")
            .as("day"))
      g.rollup("col", "row", "day")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("col").asc_nulls_first, col("row").asc_nulls_first,
          col("day").asc_nulls_first)
    })
  )

  def oracles: Map[String, String] = Map(

    // Manhattan distance on the 4×4 rook lattice from county 47001
    "q207_network_distance" ->
      """SELECT '47' || lpad(CAST(i + 1 AS VARCHAR), 3, '0') AS fips,
        |  CAST((i % 4) + (i // 4) AS BIGINT) AS hops
        |FROM range(16) t(i) ORDER BY fips""".stripMargin,

    "q208_spacetime_cube" ->
      s"""WITH g AS (${Pages.geotaggedSql}),
         |b AS (SELECT CAST(floor(x/1000.0) + 1 AS INT) AS col,
         |        CAST(floor(y/1000.0) + 1 AS INT) AS "row",
         |        CAST(floor(epoch(warc_ts) / 86400.0) AS BIGINT) AS day
         |      FROM g)
         |SELECT col, "row", day, count(*) AS n
         |FROM b GROUP BY ROLLUP (col, "row", day)
         |ORDER BY col NULLS FIRST, "row" NULLS FIRST, day NULLS FIRST"""
        .stripMargin
  )
}
