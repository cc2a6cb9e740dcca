package graft.cells

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-cell Mann–Kendall trend test — the nonparametric "is this cell's
  * activity rising or falling" monitor over the capture timeline, the
  * spatiotemporal companion of the drift suite (χ² q161, KS q222):
  *
  *   S = Σ_{i<j} sign(c_j − c_i)   over the cell's per-day counts in
  *                                  day order
  *
  * S > 0 → increasing trend, S < 0 → decreasing, |S| near 0 → none. S is
  * a pure integer statistic (counts compare exactly), so the result is
  * bit-identical on any engine — no variance approximation, no float.
  *
  * Scale shape: the event stream collapses to per-(cell, day) counts in
  * ONE keyed groupBy with map-side partials; the pair enumeration is a
  * per-cell self equi-join whose size is bounded by days², with days =
  * the crawl's age in days (a few thousand at most) — never event-sized.
  * No window, no sort.
  */
object Trend {

  /** Mann–Kendall S per cell over per-day counts of `df` (cell ids in
    * `cxCol`/`cyCol`, day index in `dayCol`). Returns one row per cell
    * with ≥ 1 observed day: (cx, cy, n_days, s_stat, trend). */
  def mannKendall(df: DataFrame, cxCol: String, cyCol: String,
                  dayCol: String): DataFrame = {
    val counts = df.groupBy(col(cxCol).as("cx"), col(cyCol).as("cy"),
        col(dayCol).as("day"))
      .agg(count(lit(1)).as("c"))
      .transform(graft.spark.PersistTracker.persist) // both join sides
    val pairs = counts.as("a")
      .join(counts.as("b"),
        col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
          col("a.day") < col("b.day"))
      .select(col("a.cx").as("cx"), col("a.cy").as("cy"),
        signum(col("b.c") - col("a.c")).cast("long").as("sg"))
      .groupBy("cx", "cy").agg(sum("sg").as("s_stat"))
    counts.groupBy("cx", "cy").agg(count(lit(1)).as("n_days"))
      .join(pairs, Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"), col("n_days"),
        coalesce(col("s_stat"), lit(0L)).as("s_stat"))
      .withColumn("trend",
        when(col("s_stat") > 0, "inc").when(col("s_stat") < 0, "dec")
          .otherwise("flat"))
  }
}
