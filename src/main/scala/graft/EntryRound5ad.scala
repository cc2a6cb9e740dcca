package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.Pages

/** Round-5 thirtieth batch: the raster-algebra toolkit over the page-
  * density grid — factor-2 bilinear regridding, morphological opening of
  * the density mask, and marching-squares contour extraction (the
  * raster→vector direction of the reference's regrid tools, computed
  * Spark-native over generated lattices; cf.
  * `src/raster/computeGridGOES.cpp`). All exact integers, all grid-sized
  * after one keyed count groupBy. */
object EntryRound5ad {

  private def cellCounts(s: SparkSession, dir: String): DataFrame =
    Pages.geotag(Pages.pages(s, dir))
      .select((col("x") / 500).cast("long").as("cx"),
        (col("y") / 500).cast("long").as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("c"))

  private val countsSql: String =
    s"""SELECT CAST(floor(x / 500) AS BIGINT) AS cx,
       |       CAST(floor(y / 500) AS BIGINT) AS cy, count(*) AS c
       |FROM (${Pages.geotaggedSql}) GROUP BY 1, 2""".stripMargin

  /** Full 16×16 lattice with zero-filled counts (oracle twin of
    * Raster.lattice). */
  private val cellsSql: String =
    s"""SELECT lat.cx, lat.cy, coalesce(cnt.c, 0) AS c
       |FROM (SELECT a.g AS cx, b.g AS cy
       |      FROM (SELECT unnest(range(16)) AS g) a,
       |           (SELECT unnest(range(16)) AS g) b) lat
       |LEFT JOIN ($countsSql) cnt USING (cx, cy)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q231_bilinear_regrid" -> ((s, dir) =>
      graft.cells.Raster.bilinearRefine(cellCounts(s, dir), 16, 16)),

    "q232_morph_open" -> ((s, dir) =>
      graft.cells.Raster.morphOpen(cellCounts(s, dir), 16, 16,
        threshold = 3L)),

    "q233_marching_squares" -> ((s, dir) =>
      graft.cells.Raster.marchingSquares(cellCounts(s, dir), 16, 16,
        threshold = 3L))
  )

  def oracles: Map[String, String] = Map(

    "q231_bilinear_regrid" ->
      s"""WITH cells AS ($cellsSql),
         |fine AS (SELECT fx, fy, fx // 2 AS ix, fy // 2 AS iy,
         |    least(greatest(fx // 2 + 2 * (fx % 2) - 1, 0), 15) AS ox,
         |    least(greatest(fy // 2 + 2 * (fy % 2) - 1, 0), 15) AS oy
         |  FROM (SELECT a.g AS fx, b.g AS fy
         |        FROM (SELECT unnest(range(32)) AS g) a,
         |             (SELECT unnest(range(32)) AS g) b))
         |SELECT f.fx, f.fy,
         |  CAST(9 * m.c + 3 * h.c + 3 * v.c + 1 * d.c AS BIGINT) AS v16
         |FROM fine f
         |JOIN cells m ON m.cx = f.ix AND m.cy = f.iy
         |JOIN cells h ON h.cx = f.ox AND h.cy = f.iy
         |JOIN cells v ON v.cx = f.ix AND v.cy = f.oy
         |JOIN cells d ON d.cx = f.ox AND d.cy = f.oy""".stripMargin,

    "q232_morph_open" ->
      s"""WITH cells AS (SELECT cx, cy,
         |    CASE WHEN c >= 3 THEN 1 ELSE 0 END AS dense
         |  FROM ($cellsSql)),
         |off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
         |                              (0,1),(1,-1),(1,0),(1,1)) o(dx, dy)),
         |er AS (SELECT a.cx, a.cy, a.dense,
         |         CASE WHEN sum(coalesce(b.dense, 0)) = 9
         |              THEN 1 ELSE 0 END AS er
         |       FROM cells a CROSS JOIN off
         |       LEFT JOIN cells b
         |         ON b.cx = a.cx + off.dx AND b.cy = a.cy + off.dy
         |       GROUP BY 1, 2, 3),
         |op AS (SELECT a.cx, a.cy, a.dense,
         |         CASE WHEN sum(coalesce(b.er, 0)) > 0
         |              THEN 1 ELSE 0 END AS opened
         |       FROM er a CROSS JOIN off
         |       LEFT JOIN er b
         |         ON b.cx = a.cx + off.dx AND b.cy = a.cy + off.dy
         |       GROUP BY 1, 2, 3)
         |SELECT cx, cy, CAST(dense AS BIGINT) AS dense,
         |  CAST(opened AS BIGINT) AS opened FROM op""".stripMargin,

    "q233_marching_squares" ->
      s"""WITH cells AS (SELECT cx, cy,
         |    CASE WHEN c >= 3 THEN 1 ELSE 0 END AS d
         |  FROM ($cellsSql)),
         |blocks AS (SELECT a.g AS bx, b.g AS by
         |           FROM (SELECT unnest(range(15)) AS g) a,
         |                (SELECT unnest(range(15)) AS g) b),
         |cs AS (SELECT bl.bx, bl.by,
         |         c00.d + 2 * c10.d + 4 * c01.d + 8 * c11.d AS case_id
         |       FROM blocks bl
         |       JOIN cells c00 ON c00.cx = bl.bx     AND c00.cy = bl.by
         |       JOIN cells c10 ON c10.cx = bl.bx + 1 AND c10.cy = bl.by
         |       JOIN cells c01 ON c01.cx = bl.bx     AND c01.cy = bl.by + 1
         |       JOIN cells c11 ON c11.cx = bl.bx + 1 AND c11.cy = bl.by + 1)
         |SELECT CAST(case_id AS BIGINT) AS case_id,
         |  CAST(count(*) AS BIGINT) AS n_blocks,
         |  CAST(count(*) * (CASE WHEN case_id IN (0, 15) THEN 0
         |                        WHEN case_id IN (6, 9) THEN 2
         |                        ELSE 1 END) AS BIGINT) AS n_segments
         |FROM cs GROUP BY case_id""".stripMargin
  )
}
