package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join without a cross product.
  *
  * Both interval sets are exploded onto the fixed-width time buckets they
  * cover, the bucket id becomes the shuffle/equi-join key, and the exact
  * overlap predicate ([ls,le] ∩ [rs,re] ≠ ∅  ⇔  ls <= re AND rs <= le)
  * rides IN the join condition. A pair that shares several buckets is
  * collapsed by a distinct over the two ids — ids only, payloads never
  * ride the second shuffle.
  *
  * This is the 1-D analogue of the regular-grid cell-cover equi-join the
  * spatial join uses for polygons (reference:
  * src/vector_64bits/polyIsect.c — candidate pairs come from shared grid
  * cells, exact geometry decides). `bucketMicros` trades per-interval
  * fan-out against join selectivity; at 100 TB pick it near the median
  * interval length so each interval covers O(1) buckets and the equi-join
  * hash-partitions evenly over time.
  */
object IntervalJoin {

  /** `left(lid, ls, le)` × `right(rid, rs, re)` (bounds inclusive, long
    * microseconds) → distinct overlapping `(lid, rid)` pairs. Set
    * `broadcastRight` when the right side is dimension-sized. */
  def overlap(left: DataFrame, right: DataFrame, bucketMicros: Long,
              broadcastRight: Boolean = false): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    def buckets(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__b", explode(sequence(
        expr(s"$s div ${bucketMicros}L"), expr(s"$e div ${bucketMicros}L"))))
    val lb = buckets(left.select("lid", "ls", "le"), "ls", "le")
    val rb0 = buckets(right.select("rid", "rs", "re"), "rs", "re")
    val rb = if (broadcastRight) broadcast(rb0) else rb0
    lb.join(rb, lb("__b") === rb("__b") &&
        lb("ls") <= rb("re") && rb("rs") <= lb("le"))
      .select(lb("lid"), rb("rid"))
      .distinct()
  }
}
