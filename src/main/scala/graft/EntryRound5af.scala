package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.Pages

/** Round-5 thirty-second batch: hexagonal cell binning (the H3-style
  * second cell vocabulary next to the quadtree Morton index) and the
  * 6-neighbor hex focal smoothing built on it. Binning is pure codegen
  * doubles replayed expression-for-expression by the oracle; everything
  * after is the usual keyed-groupBy / offset-explode discipline. */
object EntryRound5af {

  import graft.cells.HexGrid

  private val HexSize = 400.0

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // per-hex page counts + grid distance to the origin hex (0,0) —
    // the hex twin of q02's square geotag binning
    "q237_hex_bin" -> ((s, dir) => {
      val pts = Pages.geotag(Pages.pages(s, dir))
      HexGrid.attach(pts, "x", "y", HexSize)
        .groupBy("hq", "hr").agg(count(lit(1)).as("n"))
        .withColumn("ring", HexGrid.hexDist(col("hq"), col("hr"),
          lit(0L), lit(0L)))
    }),

    // 6-neighbor focal sum over the per-hex counts — hex adjacency has
    // no diagonal leakage, one fewer wasted tap than the square queen
    "q238_hex_focal" -> ((s, dir) => {
      val counts = HexGrid
        .attach(Pages.geotag(Pages.pages(s, dir)), "x", "y", HexSize)
        .groupBy("hq", "hr").agg(count(lit(1)).as("c"))
      HexGrid.focalSum(counts)
    })
  )

  def oracles: Map[String, String] = {
    val (hq, hr) = HexGrid.axialSql(HexSize)
    Map(
      "q237_hex_bin" ->
        s"""WITH pg AS (${Pages.geotaggedSql}),
           |h AS (SELECT $hq AS hq, $hr AS hr FROM pg),
           |c AS (SELECT hq, hr, count(*) AS n FROM h GROUP BY 1, 2)
           |SELECT hq, hr, n,
           |  CAST((abs(hq) + abs(hr) + abs(hq + hr)) / 2 AS BIGINT)
           |    AS ring
           |FROM c""".stripMargin,

      "q238_hex_focal" ->
        s"""WITH pg AS (${Pages.geotaggedSql}),
           |h AS (SELECT $hq AS hq, $hr AS hr FROM pg),
           |c AS (SELECT hq, hr, count(*) AS c FROM h GROUP BY 1, 2),
           |off AS (SELECT * FROM (VALUES (0,0),(1,0),(1,-1),(0,-1),
           |                              (-1,0),(-1,1),(0,1)) o(dq, dr)),
           |f AS (SELECT a.hq + off.dq AS hq, a.hr + off.dr AS hr,
           |             sum(a.c) AS focal
           |      FROM c a CROSS JOIN off GROUP BY 1, 2)
           |SELECT c.hq, c.hr, c.c, CAST(f.focal AS BIGINT) AS focal
           |FROM c JOIN f USING (hq, hr)""".stripMargin
    )
  }
}
