package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic streaming sketches (Count-Min) built as plain keyed
  * aggregations — the frequency-estimation layer of a crawl profiler,
  * constructed so any engine reproduces the IDENTICAL sketch: hash rows
  * are md5-prefix integers (the q86 hashed-feature idiom — engine-neutral,
  * no 64-bit wrap-around arithmetic, which DuckDB would reject), counters
  * are exact integer sums, and the point estimate is an integer `least()`.
  * The CMS overestimate guarantee (`est ≥ true`, `est ≤ true + εN` w.h.p.)
  * is asserted in-query for the reported tokens.
  *
  * Scale: the sketch IS a partial-aggregatable rollup — `d × width`
  * counters regardless of corpus size (here 3 × 512 = 1536 rows), built
  * in one pass over the token stream with map-side combine; estimates are
  * a broadcast join of the tiny counter table onto whatever needs them.
  * This is how a 100 TB profile fits in a dashboard: the corpus never
  * re-scans per question. */
object CountMin {

  final val Depth = 3

  /** Hash row `r` bucket of a token: the first 3 md5 nibbles of
    * `"r<r>:<token>"` as an integer, mod `width`. */
  def bucket(w: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"r$row:"), w)), 1, 3), 16, 10)
      .cast("long") % width

  /** The sketch: (row, bucket, counter) — `Depth × width` counters from
    * one pass over `(token, weight)` rows. */
  def sketch(tokenCounts: DataFrame, wCol: String, cCol: String,
             width: Int): DataFrame = {
    require(width > 0 && width <= 4096, s"width must be in 1..4096 (3 md5 " +
      s"nibbles address 4096 buckets), got $width")
    (1 to Depth).map { r =>
      tokenCounts.select(lit(r).as("row"),
        bucket(col(wCol), r, width).as("bucket"),
        col(cCol).cast("long").as("c"))
    }.reduce(_.unionByName(_))
      .groupBy("row", "bucket").agg(sum("c").as("counter"))
  }

  /** Point estimates for `probes` (a small token table): min over the
    * depth rows of the addressed counters — the classic CMS query,
    * expressed as `Depth` broadcast lookups + `least`. */
  def estimate(sketchDf: DataFrame, probes: DataFrame, wCol: String,
               width: Int): DataFrame = {
    val withBuckets = (1 to Depth).foldLeft(
      probes.select(col(wCol).as("w"))) { (acc, r) =>
      acc.withColumn(s"__b$r", bucket(col("w"), r, width))
    }
    val est = (1 to Depth).foldLeft(withBuckets) { (acc, r) =>
      acc.join(broadcast(sketchDf.where(col("row") === r)
          .select(col("bucket").as(s"__b$r"), col("counter").as(s"__c$r"))),
        Seq(s"__b$r"))
    }
    est.select(col("w"),
      least((1 to Depth).map(r => col(s"__c$r")): _*).as("cms_est"))
  }
}
