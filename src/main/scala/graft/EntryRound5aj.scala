package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.fixtures.Pages

/** Round-5 thirty-sixth batch: geostatistics + mobility — the empirical
  * semivariogram of the page-density surface (Matheron's estimator,
  * integer lag bins), stay-point detection over user event trajectories
  * (gaps-and-islands, per-user windows only), and symmetric Hausdorff
  * similarity between co-located users' visited-cell sets.
  *
  * Trajectories are synthesized deterministically from event METADATA
  * (both engines derive the same integers from (user_id, ts, event_id)):
  * each user occupies a pseudo-random zone per 3-day epoch with < 97-unit
  * jitter, so stays are real and the detector's gates bind. */
object EntryRound5aj {

  /** (user_id, tus, x, y) — the deterministic trajectory. */
  private def traj(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("x", expr(
        "(user_id * 2654435761 + (tus div 259200000000) * 40503) % 7000" +
          " + (event_id * 48271) % 97"))
      .withColumn("y", expr(
        "(user_id * 16807 + (tus div 259200000000) * 69621) % 7000" +
          " + (event_id * 16807) % 97"))
      .drop("event_id")

  /** DuckDB twin of traj(). */
  private val trajSql: String =
    """SELECT user_id, epoch_us(ts) AS tus,
      |  (user_id * 2654435761 + (epoch_us(ts) // 259200000000) * 40503)
      |    % 7000 + (event_id * 48271) % 97 AS x,
      |  (user_id * 16807 + (epoch_us(ts) // 259200000000) * 69621)
      |    % 7000 + (event_id * 16807) % 97 AS y
      |FROM events""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q246_variogram" -> ((s, dir) => {
      val pts = Pages.geotag(Pages.pages(s, dir))
        .select((col("x") / 500).cast("long").as("cx"),
          (col("y") / 500).cast("long").as("cy"))
      graft.cells.Variogram.ofCounts(pts, "cx", "cy", 16, 16, maxLagSq = 18)
    }),

    "q247_stay_points" -> ((s, dir) =>
      graft.operators.Trajectory.stayPoints(traj(s, dir), "user_id",
        "x", "y", "tus", distSqMax = 40000L,
        gapMax = 345600000000L, minDur = 86400000000L)),

    // user-subset gate (%7) bounds the DEMO pair count; the operator's
    // own scale control is the co-location candidate join
    "q248_traj_hausdorff" -> ((s, dir) => {
      val cells = traj(s, dir).where(expr("user_id % 7 = 0"))
        .select(col("user_id").as("uid"), expr("x div 500").as("cx"),
          expr("y div 500").as("cy"))
      graft.operators.Trajectory.hausdorffCells(cells)
    })
  )

  def oracles: Map[String, String] = Map(

    "q246_variogram" ->
      s"""WITH pg AS (${Pages.geotaggedSql}),
         |pts AS (SELECT CAST(floor(x / 500) AS BIGINT) AS cx,
         |               CAST(floor(y / 500) AS BIGINT) AS cy FROM pg),
         |lat AS (SELECT a.g AS cx, b.g AS cy
         |        FROM (SELECT unnest(range(16)) AS g) a,
         |             (SELECT unnest(range(16)) AS g) b),
         |cnt AS (SELECT cx, cy, count(*) AS c FROM pts GROUP BY 1, 2),
         |cells AS (SELECT lat.cx, lat.cy,
         |            CAST(coalesce(cnt.c, 0) AS HUGEINT) AS n
         |          FROM lat LEFT JOIN cnt USING (cx, cy)),
         |offs AS (SELECT a.g AS dx, b.g AS dy,
         |           a.g * a.g + b.g * b.g AS d2
         |         FROM (SELECT unnest(range(-4, 5)) AS g) a,
         |              (SELECT unnest(range(-4, 5)) AS g) b
         |         WHERE a.g * a.g + b.g * b.g BETWEEN 1 AND 18),
         |pr AS (SELECT o.d2, a.n - b.n AS dd
         |       FROM cells a, offs o, cells b
         |       WHERE b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy)
         |SELECT CAST(d2 AS BIGINT) AS dist_sq,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(dd * dd) AS BIGINT) AS sum_sq_diff,
         |  CAST((1000000 * sum(dd * dd)) // (2 * count(*)) AS BIGINT)
         |    AS gamma_e6
         |FROM pr GROUP BY 1""".stripMargin,

    "q247_stay_points" ->
      s"""WITH d AS ($trajSql),
         |l AS (SELECT *, lag(x) OVER w AS px, lag(y) OVER w AS py,
         |        lag(tus) OVER w AS pt
         |      FROM d
         |      WINDOW w AS (PARTITION BY user_id ORDER BY tus, x, y)),
         |f AS (SELECT *, CASE WHEN pt IS NULL
         |        OR (x - px) * (x - px) + (y - py) * (y - py) > 40000
         |        OR tus - pt > 345600000000 THEN 1 ELSE 0 END AS nw
         |      FROM l),
         |s AS (SELECT *, sum(nw) OVER (PARTITION BY user_id
         |        ORDER BY tus, x, y
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |      FROM f)
         |SELECT user_id, CAST(min(tus) AS BIGINT) AS start_t,
         |  CAST(max(tus) AS BIGINT) AS end_t,
         |  CAST(count(*) AS BIGINT) AS n_pts,
         |  CAST(sum(x) // count(*) AS BIGINT) AS cx_mean,
         |  CAST(sum(y) // count(*) AS BIGINT) AS cy_mean
         |FROM s GROUP BY user_id, sid
         |HAVING max(tus) - min(tus) >= 86400000000 AND count(*) >= 2""".stripMargin,

    "q248_traj_hausdorff" ->
      s"""WITH d AS ($trajSql),
         |cl AS (SELECT DISTINCT user_id AS uid, x // 500 AS cx,
         |         y // 500 AS cy FROM d WHERE user_id % 7 = 0),
         |pairs AS (SELECT DISTINCT a.uid AS ua, b.uid AS ub
         |          FROM cl a JOIN cl b
         |            ON a.cx = b.cx AND a.cy = b.cy AND a.uid < b.uid),
         |prod AS (SELECT p.ua, p.ub, a.cx AS ax, a.cy AS ay,
         |           b.cx AS bx, b.cy AS bcy,
         |           greatest(abs(a.cx - b.cx), abs(a.cy - b.cy)) AS dd
         |         FROM pairs p JOIN cl a ON a.uid = p.ua
         |                      JOIN cl b ON b.uid = p.ub),
         |hab AS (SELECT ua, ub, max(m) AS h FROM
         |          (SELECT ua, ub, ax, ay, min(dd) AS m FROM prod
         |           GROUP BY 1, 2, 3, 4) GROUP BY 1, 2),
         |hba AS (SELECT ua, ub, max(m) AS h FROM
         |          (SELECT ua, ub, bx, bcy, min(dd) AS m FROM prod
         |           GROUP BY 1, 2, 3, 4) GROUP BY 1, 2)
         |SELECT hab.ua, hab.ub,
         |  CAST(greatest(hab.h, hba.h) AS BIGINT) AS h_cheb
         |FROM hab JOIN hba ON hab.ua = hba.ua AND hab.ub = hba.ub""".stripMargin
  )
}
