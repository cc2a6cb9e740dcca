package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join: match each point `p` to the range rows whose
  * `[lo, hi]` contains it (IP → CIDR block, timestamp → maintenance
  * window, position → annotation span). Spark's native plan for
  * `p BETWEEN lo AND hi` is BroadcastNestedLoopJoin (every point × every
  * range) — fine for a handful of ranges, fatal for millions.
  *
  * This is the bucketed equi-join formulation: ranges explode onto the
  * fixed-width buckets they overlap, points map to their single bucket,
  * and the join becomes a hash equi-join on the bucket id followed by the
  * exact containment filter. Cost: |ranges| · avg-buckets-per-range
  * replicated rows (choose `bucketWidth` near the typical range width so
  * that factor stays O(1)) and ONE keyed exchange — no cross product
  * anywhere. Both sides partition by bucket, so skew follows bucket
  * population and is AQE-splittable. */
object RangeJoin {

  /** `points(… pointCol …)` ⋈ `ranges(… loCol, hiCol, payload …)` →
    * every point row + the payload columns of each containing range
    * (left join: a point in no range keeps nulls). Ranges are treated as
    * closed `[lo, hi]`. */
  def pointInRange(points: DataFrame, ranges: DataFrame, pointCol: String,
                   loCol: String, hiCol: String, payloadCols: Seq[String],
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(payloadCols.nonEmpty, "range join needs payload columns")
    val pointCols = points.columns.toSeq
    require(!pointCols.exists(payloadCols.contains),
      s"payload columns ${payloadCols.mkString(",")} collide with points")
    val expanded = ranges.select(
        col(loCol).cast("long").as("__lo"), col(hiCol).cast("long").as("__hi"),
        struct(payloadCols.map(col): _*).as("__p"))
      .where(col("__lo") <= col("__hi"))
      .withColumn("__b", explode(sequence(
        expr(s"__lo div ${bucketWidth}L"), expr(s"__hi div ${bucketWidth}L"))))
    val pts = points
      .withColumn("__v", col(pointCol).cast("long"))
      .withColumn("__pb", expr(s"__v div ${bucketWidth}L"))
    // containment lives IN the join condition (not a post-filter), so the
    // left join keeps points matching no range as one null-payload row —
    // Catalyst still extracts the bucket equality as the hash-join key and
    // evaluates containment as the join filter
    pts.join(expanded,
        pts("__pb") === expanded("__b") &&
          pts("__v") >= expanded("__lo") && pts("__v") <= expanded("__hi"),
        "left")
      .select(pointCols.map(col) ++
        payloadCols.map(c => col(s"__p.$c").as(c)): _*)
  }
}
