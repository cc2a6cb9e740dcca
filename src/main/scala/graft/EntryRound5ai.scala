package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.Pages

/** Round-5 thirty-fifth batch: terrain analysis of the page-density
  * surface — Getis–Ord Gi* hot spots (the z-score face of the
  * autocorrelation layer, exact z² rational ladder), Horn slope/aspect
  * (the classic GIS surface derivative in pure integers), and D8 flow
  * basins (steepest-descent pointers resolved by pointer doubling —
  * raster hydrology as a graph composition). */
object EntryRound5ai {

  private def cells(s: SparkSession, dir: String): DataFrame =
    Pages.geotag(Pages.pages(s, dir))
      .select((col("x") / 500).cast("long").as("cx"),
        (col("y") / 500).cast("long").as("cy"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q243_getis_gistar" -> ((s, dir) =>
      graft.cells.Autocorr.getisGiStar(cells(s, dir), "cx", "cy", 16, 16)),

    "q244_d8_basins" -> ((s, dir) =>
      graft.cells.Terrain.d8Basins(cells(s, dir), "cx", "cy", 16, 16)),

    "q245_slope_aspect" -> ((s, dir) =>
      graft.cells.Terrain.hornGradient(cells(s, dir), "cx", "cy", 16, 16))
  )

  // shared oracle prologue: the 16×16 count lattice over geotagged pages
  private val latticeSql: String =
    s"""pg AS (${Pages.geotaggedSql}),
       |pts AS (SELECT CAST(floor(x / 500) AS BIGINT) AS cx,
       |               CAST(floor(y / 500) AS BIGINT) AS cy FROM pg),
       |lat AS (SELECT a.g AS cx, b.g AS cy
       |        FROM (SELECT unnest(range(16)) AS g) a,
       |             (SELECT unnest(range(16)) AS g) b),
       |cnt AS (SELECT cx, cy, count(*) AS c FROM pts GROUP BY 1, 2),
       |cells AS (SELECT lat.cx, lat.cy,
       |            CAST(coalesce(cnt.c, 0) AS HUGEINT) AS n
       |          FROM lat LEFT JOIN cnt USING (cx, cy))""".stripMargin

  def oracles: Map[String, String] = Map(

    "q243_getis_gistar" ->
      s"""WITH $latticeSql,
         |tot AS (SELECT CAST(sum(n) AS HUGEINT) AS s,
         |               CAST(count(*) AS HUGEINT) AS nc,
         |               CAST(sum(n * n) AS HUGEINT) AS ss FROM cells),
         |offs AS (SELECT * FROM (VALUES (0,0),(-1,-1),(-1,0),(-1,1),
         |           (0,-1),(0,1),(1,-1),(1,0),(1,1)) o(dx, dy)),
         |loc AS (SELECT a.cx, a.cy, CAST(sum(b.n) AS HUGEINT) AS l,
         |          CAST(count(*) AS HUGEINT) AS w
         |        FROM cells a, offs o, cells b
         |        WHERE b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
         |        GROUP BY 1, 2),
         |fin AS (SELECT cx, cy, CAST(w AS BIGINT) AS w_i,
         |          CAST(l AS BIGINT) AS local_sum,
         |          nc * l - s * w AS num,
         |          (nc * ss - s * s) * (nc * w - w * w) AS den,
         |          nc
         |        FROM loc, tot)
         |SELECT cx, cy, w_i, local_sum,
         |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1
         |       ELSE 0 END AS BIGINT) AS gi_sign,
         |  CAST(CASE WHEN den = 0 THEN 0
         |       ELSE (1000000 * num * num * (nc - 1)) // den
         |       END AS BIGINT) AS zsq_e6
         |FROM fin""".stripMargin,

    "q244_d8_basins" ->
      s"""WITH RECURSIVE $latticeSql,
         |offs AS (SELECT * FROM (VALUES (0,-1,-1),(1,-1,0),(2,-1,1),
         |           (3,0,-1),(4,0,1),(5,1,-1),(6,1,0),(7,1,1))
         |           o(idx, dx, dy)),
         |nb AS (SELECT a.cx, a.cy, o.idx, a.n - b.n AS dr,
         |         b.cy * 16 + b.cx AS dst
         |       FROM cells a, offs o, cells b
         |       WHERE b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy),
         |mx AS (SELECT cx, cy, max(dr) AS m FROM nb GROUP BY 1, 2),
         |sel AS (SELECT nb.cx, nb.cy, min(nb.idx) AS idx
         |        FROM nb JOIN mx ON nb.cx = mx.cx AND nb.cy = mx.cy
         |          AND nb.dr = mx.m
         |        WHERE mx.m > 0 GROUP BY 1, 2),
         |ptr AS (SELECT s.cy * 16 + s.cx AS src,
         |          (s.cy + o.dy) * 16 + (s.cx + o.dx) AS dst
         |        FROM sel s JOIN offs o USING (idx)),
         |walk AS (
         |  SELECT cy * 16 + cx AS node, cy * 16 + cx AS cur FROM cells
         |  UNION ALL
         |  SELECT w.node, p.dst FROM walk w JOIN ptr p ON w.cur = p.src),
         |term AS (SELECT node, cur FROM walk
         |         WHERE cur NOT IN (SELECT src FROM ptr))
         |SELECT CAST(cur % 16 AS BIGINT) AS sink_cx,
         |  CAST(cur // 16 AS BIGINT) AS sink_cy,
         |  CAST(count(*) AS BIGINT) AS basin_cells
         |FROM term GROUP BY 1, 2""".stripMargin,

    "q245_slope_aspect" ->
      s"""WITH $latticeSql,
         |w AS (SELECT * FROM (VALUES (-1,-1,-1,-1),(-1,0,-2,0),(-1,1,-1,1),
         |        (0,-1,0,-2),(0,1,0,2),
         |        (1,-1,1,-1),(1,0,2,0),(1,1,1,1)) o(dx, dy, wx, wy)),
         |g AS (SELECT a.cx, a.cy,
         |        CAST(sum(w.wx * b.n) AS BIGINT) AS dzdx,
         |        CAST(sum(w.wy * b.n) AS BIGINT) AS dzdy,
         |        count(*) AS nn
         |      FROM cells a, w, cells b
         |      WHERE b.cx = a.cx + w.dx AND b.cy = a.cy + w.dy
         |      GROUP BY 1, 2)
         |SELECT cx, cy, dzdx, dzdy,
         |  CAST(dzdx * dzdx + dzdy * dzdy AS BIGINT) AS grad_sq,
         |  CAST(CASE
         |    WHEN dzdx = 0 AND dzdy = 0 THEN -1
         |    WHEN abs(dzdx) >= abs(dzdy) AND dzdx > 0 AND dzdy >= 0 THEN 0
         |    WHEN abs(dzdx) < abs(dzdy) AND dzdy > 0 AND dzdx >= 0 THEN 1
         |    WHEN abs(dzdx) < abs(dzdy) AND dzdy > 0 THEN 2
         |    WHEN abs(dzdx) >= abs(dzdy) AND dzdx < 0 AND dzdy >= 0 THEN 3
         |    WHEN abs(dzdx) >= abs(dzdy) AND dzdx < 0 THEN 4
         |    WHEN abs(dzdx) < abs(dzdy) AND dzdy < 0 AND dzdx <= 0 THEN 5
         |    WHEN abs(dzdx) < abs(dzdy) AND dzdy < 0 THEN 6
         |    ELSE 7 END AS BIGINT) AS octant
         |FROM g WHERE nn = 8""".stripMargin
  )
}
