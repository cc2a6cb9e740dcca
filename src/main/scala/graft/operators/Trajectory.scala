package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trajectory analytics over per-entity point streams (user mobility
  * from the event log; the same operators serve vehicle traces or
  * crawl-session hops):
  *
  *  - [[stayPoints]] — stay-point detection (Li et al. 2008,
  *    GeoLife-style): a stay is a maximal run of CONSECUTIVE points
  *    where each hop stays within a distance gate and a time gate; runs
  *    long enough (duration ≥ minDur, ≥ 2 points) are reported with
  *    their integer centroid. Expressed as the classic gaps-and-islands
  *    plan: one `lag` + running `sum` window PARTITIONED BY the entity
  *    (never global), then a keyed aggregate — at 10¹² events the only
  *    exchange is the per-user hash partitioning.
  *
  *  - [[hausdorffCells]] — symmetric Hausdorff distance (Chebyshev
  *    metric, exact integers) between the visited-CELL sets of entity
  *    pairs that share at least one cell. The co-location gate is the
  *    candidate generator (the image-near-dup discipline: never
  *    all-pairs); per pair the |A|×|B| product is bounded by the cell
  *    vocabulary an entity can visit, not by its raw point count.
  */
object Trajectory {

  /** Segment `df` (idCol, xCol, yCol, tCol in integer units, e.g. µs)
    * into stay points: consecutive-hop gates `distSqMax` (squared
    * Euclidean) and `gapMax` (same unit as tCol); keep segments with
    * span ≥ `minDur` and ≥ 2 points. Output: (idCol, start_t, end_t,
    * n_pts, cx_mean, cy_mean) with floor-div centroids. */
  def stayPoints(df: DataFrame, idCol: String, xCol: String, yCol: String,
                 tCol: String, distSqMax: Long, gapMax: Long,
                 minDur: Long): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col(tCol), col(xCol), col(yCol))
    val run = Window.partitionBy(idCol).orderBy(col(tCol), col(xCol), col(yCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dx = col(xCol) - lag(xCol, 1).over(w)
    val dy = col(yCol) - lag(yCol, 1).over(w)
    val dt = col(tCol) - lag(tCol, 1).over(w)
    df.withColumn("__new",
        when(lag(tCol, 1).over(w).isNull ||
          dx * dx + dy * dy > distSqMax || dt > gapMax, 1L).otherwise(0L))
      .withColumn("__seg", sum("__new").over(run))
      .groupBy(col(idCol), col("__seg"))
      .agg(min(tCol).as("start_t"), max(tCol).as("end_t"),
        count(lit(1)).as("n_pts"),
        sum(xCol).as("__sx"), sum(yCol).as("__sy"))
      .where(col("end_t") - col("start_t") >= minDur && col("n_pts") >= 2)
      .select(col(idCol), col("start_t"), col("end_t"), col("n_pts"),
        expr("__sx div n_pts").as("cx_mean"),
        expr("__sy div n_pts").as("cy_mean"))
  }

  /** Symmetric Hausdorff (Chebyshev, exact integers) between visited-cell
    * sets: `cells` is (uid, cx, cy) DISTINCT rows. Pairs = entities
    * sharing ≥ 1 cell (ua < ub). Output: (ua, ub, h_cheb). */
  def hausdorffCells(cells: DataFrame): DataFrame = {
    val c = cells.select(col("uid"), col("cx"), col("cy")).distinct()
      .transform(graft.spark.PersistTracker.persist) // pairs + 2 products
    val pairs = c.as("a").join(c.as("b"),
        col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
          col("a.uid") < col("b.uid"))
      .select(col("a.uid").as("ua"), col("b.uid").as("ub")).distinct()
    val prod = pairs
      .join(c.select(col("uid").as("ua"), col("cx").as("ax"),
        col("cy").as("ay")), "ua")
      .join(c.select(col("uid").as("ub"), col("cx").as("bx"),
        col("cy").as("by")), "ub")
      .select(col("ua"), col("ub"), col("ax"), col("ay"), col("bx"),
        col("by"),
        greatest(abs(col("ax") - col("bx")), abs(col("ay") - col("by")))
          .as("d"))
      .transform(graft.spark.PersistTracker.persist) // both directions
    val hAB = prod.groupBy("ua", "ub", "ax", "ay").agg(min("d").as("m"))
      .groupBy("ua", "ub").agg(max("m").as("h_ab"))
    val hBA = prod.groupBy("ua", "ub", "bx", "by").agg(min("d").as("m"))
      .groupBy("ua", "ub").agg(max("m").as("h_ba"))
    hAB.join(hBA, Seq("ua", "ub"))
      .select(col("ua"), col("ub"),
        greatest(col("h_ab"), col("h_ba")).as("h_cheb"))
  }
}
