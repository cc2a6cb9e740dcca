package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.TpchGeo

/** Round-5 twentieth batch: kernel-density heat map and inverse-distance
  * interpolation — the two classic point→raster cartographic operators,
  * in exact integer arithmetic so any engine replays them bit for bit. */
object EntryRound5t {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // kernel density (Epanechnikov-shaped integer kernel r² − d²): each
    // point contributes to the few cells whose center lies within r —
    // candidate cells from the point's r-expanded bbox (the corridor
    // trick on a point), one keyed sum; never points × all-cells
    "q205_kde_heatmap" -> ((s, dir) => {
      val r = 1500L
      val pts = TpchGeo.points(s, dir)
      pts
        .withColumn("col", explode(sequence(
          greatest(lit(1), (floor((col("x") - r) / 1000.0) + 1).cast("int")),
          least(lit(8), (floor((col("x") + r) / 1000.0) + 1).cast("int")))))
        .withColumn("row", explode(sequence(
          greatest(lit(1), (floor((col("y") - r) / 1000.0) + 1).cast("int")),
          least(lit(8), (floor((col("y") + r) / 1000.0) + 1).cast("int")))))
        .withColumn("dx", col("x") - (col("col") * 1000.0 - 500.0))
        .withColumn("dy", col("y") - (col("row") * 1000.0 - 500.0))
        .withColumn("d2",
          (col("dx") * col("dx") + col("dy") * col("dy")).cast("long"))
        .where(col("d2") <= r * r)
        .groupBy("col", "row")
        .agg(sum(lit(r * r) - col("d2")).as("heat"),
          count(lit(1)).as("n_pts"))
        .orderBy("col", "row")
    }),

    // inverse-distance-weighted interpolation of site values onto cell
    // centers: weight_i = 10^6 div (d2_i + 1) (integer, no zero case),
    // numer_i = v_i·10^6 div (d2_i + 1), idw = numer div weight-sum —
    // exact integer end to end, sites prefiltered to a 2000-unit radius
    // via the same bbox cell cover
    "q206_idw_surface" -> ((s, dir) => {
      val rr = 2000L
      val sites = TpchGeo.knnSites(s, dir)
        .withColumn("v", (col("sid") * 7 % 100 + 1).cast("long"))
      sites
        .withColumn("col", explode(sequence(
          greatest(lit(1), (floor((col("sx") - rr) / 1000.0) + 1).cast("int")),
          least(lit(8), (floor((col("sx") + rr) / 1000.0) + 1).cast("int")))))
        .withColumn("row", explode(sequence(
          greatest(lit(1), (floor((col("sy") - rr) / 1000.0) + 1).cast("int")),
          least(lit(8), (floor((col("sy") + rr) / 1000.0) + 1).cast("int")))))
        .withColumn("dx", col("sx") - (col("col") * 1000.0 - 500.0))
        .withColumn("dy", col("sy") - (col("row") * 1000.0 - 500.0))
        .withColumn("d2",
          (col("dx") * col("dx") + col("dy") * col("dy")).cast("long"))
        .where(col("d2") <= rr * rr)
        .withColumn("wgt", expr("1000000L div (d2 + 1)"))
        .groupBy("col", "row")
        .agg(count(lit(1)).as("n_sites"),
          sum(expr("v * 1000000L div (d2 + 1)")).as("numer"),
          sum(col("wgt")).as("denom"))
        .where(col("denom") > 0)
        .withColumn("idw", expr("numer div denom"))
        .select("col", "row", "n_sites", "idw")
        .orderBy("col", "row")
    })
  )

  def oracles: Map[String, String] = Map(

    "q205_kde_heatmap" ->
      s"""WITH pts AS (${TpchGeo.pointsSql}),
         |cl AS (SELECT CAST(c % 8 + 1 AS INT) AS col,
         |         CAST(c // 8 + 1 AS INT) AS "row",
         |         (c % 8) * 1000.0 + 500 AS cx, (c // 8) * 1000.0 + 500 AS cy
         |       FROM range(64) t(c)),
         |d AS (SELECT col, "row",
         |        CAST((x-cx)*(x-cx)+(y-cy)*(y-cy) AS BIGINT) AS d2
         |      FROM pts CROSS JOIN cl)
         |SELECT col, "row", CAST(sum(2250000 - d2) AS BIGINT) AS heat,
         |  count(*) AS n_pts
         |FROM d WHERE d2 <= 2250000
         |GROUP BY 1, 2 ORDER BY col, "row"""".stripMargin,

    "q206_idw_surface" ->
      """WITH s AS (SELECT s_suppkey AS sid,
        |    CAST((s_suppkey*27179) % 8000 AS DOUBLE) AS sx,
        |    CAST((s_suppkey*15101) % 8000 AS DOUBLE) AS sy,
        |    s_suppkey * 7 % 100 + 1 AS v
        |  FROM supplier),
        |cl AS (SELECT CAST(c % 8 + 1 AS INT) AS col,
        |         CAST(c // 8 + 1 AS INT) AS "row",
        |         (c % 8) * 1000.0 + 500 AS cx, (c // 8) * 1000.0 + 500 AS cy
        |       FROM range(64) t(c)),
        |d AS (SELECT col, "row", v,
        |        CAST((sx-cx)*(sx-cx)+(sy-cy)*(sy-cy) AS BIGINT) AS d2
        |      FROM s CROSS JOIN cl),
        |f AS (SELECT col, "row", v, d2 FROM d WHERE d2 <= 4000000)
        |SELECT col, "row", count(*) AS n_sites,
        |  CAST(sum(v * 1000000 // (d2 + 1)) //
        |       sum(1000000 // (d2 + 1)) AS BIGINT) AS idw
        |FROM f GROUP BY 1, 2 HAVING sum(1000000 // (d2 + 1)) > 0
        |ORDER BY col, "row"""".stripMargin
  )
}
