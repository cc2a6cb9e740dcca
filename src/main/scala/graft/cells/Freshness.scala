package graft.cells

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Freshness-weighted density: exponential half-life decay kept in EXACT
  * integer arithmetic. A page of age `a` (in whatever unit the caller
  * derives — days, crawl cycles) contributes `1e6 >> (a div h)` micro-units
  * for half-life `h`: halving per half-life as a bit shift, so any engine
  * and any partitioning sums to the identical integer. The floating form
  * (`exp(-λa)`) would differ in the last ulp across engines AND sum
  * order-dependently; the shift form is the recency weighting a
  * freshness-ranked crawl index can actually reproduce everywhere.
  *
  * Scale: weight is a codegen'd per-row expression; the per-cell rollup is
  * one partial-aggregated integer sum keyed on the cell — the same shape
  * as any page-density surface. */
object Freshness {

  final val ScaleMicro = 1000000L

  /** `1e6 >> (age div halfLife)` over the named BIGINT age column, with a
    * 62-shift clamp (beyond 62 the weight is exactly 0 anyway — the clamp
    * stops the undefined-shift range, it does not change any value) and
    * negative ages (clock skew: capture "newer" than the reference
    * instant) pinned to full weight. */
  def halfLifeWeightMicro(ageCol: String, halfLife: Int): Column = {
    require(halfLife > 0, s"halfLife must be positive, got $halfLife")
    expr(s"CASE WHEN $ageCol < 0 THEN ${ScaleMicro}L " +
      s"WHEN ($ageCol div $halfLife) > 62 THEN 0L " +
      s"ELSE shiftright(${ScaleMicro}L, " +
      s"cast(($ageCol div $halfLife) as int)) END")
  }

  /** Per-cell freshness-weighted page density: (ix, iy, n_pages, w_sum)
    * with w_sum the exact integer sum of per-page decay weights. */
  def decayDensity(df: DataFrame, ixCol: String, iyCol: String,
                   ageCol: String, halfLife: Int): DataFrame =
    df.select(col(ixCol).as("ix"), col(iyCol).as("iy"),
        halfLifeWeightMicro(ageCol, halfLife).as("w"))
      .groupBy("ix", "iy")
      .agg(count(lit(1)).as("n_pages"), sum("w").as("w_sum"))
}

/** Per-cell categorical diversity — Shannon entropy of the language mix
  * in integer micro-nats. Each category's term
  * `round(1e6 · (c/n) · ln(n/c))` is quantized INDEPENDENTLY (exact
  * integer operands, fixed left-associated double expression both
  * engines), then summed exactly — so a float statistic over a float sum
  * becomes an order-independent integer, the same construction as the
  * LM/PMI scores. The map this draws is the "is this region's crawl
  * monolingual?" coverage diagnostic.
  *
  * Scale: one keyed (cell, lang) aggregation with map-side combine, a
  * per-cell window over ≤ |languages| rows, one keyed rollup. */
object Diversity {

  def cellEntropy(df: DataFrame, ixCol: String, iyCol: String,
                  langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(ixCol).as("ix"), col(iyCol).as("iy"),
        col(langCol).as("lang"))
      .agg(count(lit(1)).as("c"))
    counts
      .withColumn("n", sum(col("c")).over(Window.partitionBy("ix", "iy")))
      .select(col("ix"), col("iy"), col("c"), col("n"),
        round(lit(1e6) * (col("c") / col("n")) * log(col("n") / col("c")), 0)
          .cast("long").as("term"))
      .groupBy("ix", "iy")
      .agg(max(col("n")).as("n_pages"), count(lit(1)).as("n_langs"),
        sum(col("term")).as("ent_micro"))
  }
}
