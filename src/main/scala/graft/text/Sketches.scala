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
    * ONE pass over `(token, weight)` rows: each input row emits its Depth
    * (row, bucket) addresses through a single inline array explode, so an
    * unpersisted/expensive upstream is scanned once (a union of per-row
    * selects would execute it Depth times). */
  def sketch(tokenCounts: DataFrame, wCol: String, cCol: String,
             width: Int): DataFrame = {
    require(width > 0 && width <= 4096, s"width must be in 1..4096 (3 md5 " +
      s"nibbles address 4096 buckets), got $width")
    tokenCounts
      .select(explode(array((1 to Depth).map(r =>
          struct(lit(r).as("row"), bucket(col(wCol), r, width).as("bucket")))
          : _*)).as("rb"),
        col(cCol).cast("long").as("c"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(sum("c").as("counter"))
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
    // LEFT joins: a probe addressing an empty bucket has counter 0 (it was
    // never added), not "no estimate" — an inner join would silently drop
    // the probe row
    val est = (1 to Depth).foldLeft(withBuckets) { (acc, r) =>
      acc.join(broadcast(sketchDf.where(col("row") === r)
          .select(col("bucket").as(s"__b$r"), col("counter").as(s"__c$r"))),
        Seq(s"__b$r"), "left")
    }
    est.select(col("w"),
      least((1 to Depth).map(r => coalesce(col(s"__c$r"), lit(0L))): _*)
        .as("cms_est"))
  }
}

/** HyperLogLog distinct-count estimation (Flajolet et al. 2007), built so
  * the ESTIMATE ITSELF is bit-identical on any engine — the property that
  * normally makes sketches un-oracle-able:
  *
  *   - bucket/rank come from md5-prefix integers (engine-neutral);
  *   - the leading-zero rank is an integer CASE ladder on power-of-two
  *     thresholds (no `log2`, whose last-ulp rounding could flip a rank);
  *   - the harmonic sum is kept as the exact INTEGER `Σ 2^(33−reg)` (every
  *     term a power of two ≥ 1; 64 terms fit a long exactly), converted to
  *     a double in ONE final division by a single injected constant;
  *   - the small-range correction branch (`m·ln(m/V)`) is one `ln` of an
  *     exactly-representable ratio.
  *
  * Scale: registers are a `groups × m` aggregate (max per bucket) — the
  * sketch a 10^12-url crawl ships to the driver is kilobytes per group,
  * and register tables MERGE by max, so per-partition sketches combine
  * without re-scanning (the entire point of HLL at 100 TB). */
object HyperLogLog {

  final val M = 64 // 2^6 buckets
  /** alpha_m · m² · 2^33 precomputed in Scala and injected as ONE literal
    * into both engines, so neither engine's constant folding order
    * matters. */
  final val K: Double = 0.709 * (M.toDouble * M.toDouble) * 8589934592.0

  /** rank = leading zeros of the 32-bit hash stream + 1 (v = 0 → 33), as
    * an integer threshold ladder. */
  def rho32(v: Column): Column =
    (31 to 0 by -1).foldLeft(when(v === 0L, lit(33))) { (acc, k) =>
      acc.when(v >= (1L << k), lit(32 - k))
    }.otherwise(lit(33))

  /** The same ladder as SQL text (for DuckDB oracles). */
  def rho32Sql(v: String): String =
    s"CASE WHEN $v = 0 THEN 33 " +
      (31 to 0 by -1).map(k => s"WHEN $v >= ${1L << k} THEN ${32 - k}")
        .mkString(" ") + " END"

  /** Per-group HLL estimate of distinct `wCol` values:
    * (group, hll_est). */
  def estimateDistinct(df: DataFrame, groupCol: String,
                       wCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df.select(col(groupCol).as("g"),
        (conv(substring(md5(col(wCol)), 1, 2), 16, 10).cast("long") % M)
          .as("bucket"),
        conv(substring(md5(col(wCol)), 3, 8), 16, 10).cast("long").as("v"))
      .select(col("g"), col("bucket"), rho32(col("v")).as("rho"))
      .groupBy("g", "bucket").agg(max("rho").as("reg"))
      // two consumers (group frame + register join): materialize the TINY
      // register table once instead of scanning the corpus twice
      .localCheckpoint(true)
    // every non-empty group has >= 1 register row, so the frame derives
    // from the registers (groups x <= 64 rows), not from a second corpus
    // scan
    val allBuckets = hashed.select(col("g")).distinct()
      .crossJoin((0 until M).toDF("bucket"))
    val regs = allBuckets.join(hashed, Seq("g", "bucket"), "left")
      .select(col("g"), coalesce(col("reg"), lit(0)).as("reg"))
    regs.groupBy("g")
      .agg(sum(expr("shiftleft(1L, cast(33 - reg as int))")).as("s"),
        sum(when(col("reg") === 0, 1L).otherwise(0L)).as("zeros"))
      .select(col("g"),
        when((lit(K) / col("s") <= 2.5 * M) && col("zeros") > 0,
            round(lit(M.toDouble) * log(lit(M.toDouble) / col("zeros")), 0))
          .otherwise(round(lit(K) / col("s"), 0))
          .cast("long").as("hll_est"))
  }
}

/** Mergeable fixed-width histogram quantile sketch — the 100 TB-scale
  * companion to `PipelineOps.exactPercentiles`: the exact operator ranks
  * every row inside a per-group window (a per-group sort of the DATA),
  * while the sketch reduces each group to `ceil(range/binWidth)` counters
  * with map-side combine, then ranks the COUNTERS. Error is bounded and
  * one-sided by construction: the estimate is the inclusive upper edge of
  * the first bin whose cumulative count reaches the ceiling rank
  * `(n·p+99) div 100` — the same rank convention as the exact operator —
  * so `exact ≤ estimate < exact + binWidth` always (property-gated in
  * SketchesSpec).
  *
  * The sketch is a pure keyed aggregation: deterministic on any engine,
  * trivially mergeable across partitions/days (counters add), and the
  * per-group window that orders bins runs over counter rows, never data
  * rows. */
object HistQuantile {

  /** `(groupCol, valCol)` (non-negative integer values) → one row per
    * group: `(g, n_rows, p<P>_est…)` with the estimates at the bins'
    * inclusive upper edges. */
  def quantiles(df: DataFrame, groupCol: String, valCol: String,
                binWidth: Long, ps: Seq[Int]): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1: $binWidth")
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in 1..100, got $ps")
    import org.apache.spark.sql.expressions.Window
    val bins = df
      .select(col(groupCol).as("g"),
        expr(s"cast($valCol as long) div $binWidth").as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("g").orderBy("bin")
    val cum = bins
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
    cum.groupBy("g")
      .agg(max(col("n")).as("n_rows"),
        ps.map(p => min(when(
          col("cum") >= expr(s"(n * $p + 99) div 100"),
          col("bin") * binWidth + binWidth - 1)).as(s"p${p}_est")): _*)
  }
}
