package graft.cells

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ripley's K point-pattern statistic — for each radius r, the expected
  * number of further points within r of a typical point, scaled by
  * intensity: K(r) = A · 2·P(r) / (n·(n−1)) with P(r) the count of
  * unordered pairs at squared distance ≤ r² and A the domain area
  * (border-uncorrected form). K(r) ≈ πr² means complete spatial
  * randomness; above = clustering at that range, below = inhibition —
  * the multi-scale sibling of the single-number Moran's I.
  *
  * Exact integer discipline: coordinates are integer lattice points, so
  * d² = Δx²+Δy² is an exact Long and the radius test d² ≤ r² is exact;
  * the single division per radius happens once on the final per-radius
  * aggregate, trunc(10⁶·A·2·P div (n·(n−1))) — bit-identical to HUGEINT
  * `//`.
  *
  * Scale shape: NEVER all-pairs. Each point lands in one coarse bucket of
  * side `maxR`; probes explode to the 3×3 neighborhood and equi-join the
  * bucketed points — the corridor-join discipline — so candidate pairs
  * are distance-bounded by construction (any pair with d ≤ maxR shares
  * that neighborhood). Each unordered pair produces exactly two directed
  * candidate rows of which `idA < idB` keeps one: no distinct, no
  * re-enumeration. One radius-conditional aggregate finishes the job.
  */
object RipleyK {

  /** K at each of `radii` (all ≤ `maxR`) over integer points
    * (`idCol`,`xCol`,`yCol`); `area` is the observation-window area.
    * Returns one row per radius: (r, n_points, n_pairs, k_e6). */
  def k(pts: DataFrame, idCol: String, xCol: String, yCol: String,
        radii: Seq[Long], maxR: Long, area: Long): DataFrame = {
    require(radii.nonEmpty && radii.forall(r => r > 0 && r <= maxR),
      s"radii must be in (0, $maxR]")
    val p = pts.select(col(idCol).as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .transform(graft.spark.PersistTracker.persist) // probe + build sides
    val tot = p.agg(count(lit(1)).as("n"))
    val bucketed = p.select(col("id").as("idB"), col("x").as("xb"),
      col("y").as("yb"), expr(s"x div $maxR").as("gx"),
      expr(s"y div $maxR").as("gy"))
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    val probes = p.select(col("id").as("idA"), col("x").as("xa"),
        col("y").as("ya"), explode(typedLit(offsets)).as("o"),
        expr(s"x div $maxR").as("g0x"), expr(s"y div $maxR").as("g0y"))
      .select(col("idA"), col("xa"), col("ya"),
        (col("g0x") + col("o._1")).as("gx"),
        (col("g0y") + col("o._2")).as("gy"))
    val cand = probes.join(bucketed, Seq("gx", "gy"))
      .where(col("idA") < col("idB"))
      .select(((col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("d2"))
    val aggs = radii.map(r => coalesce(
      sum(when(col("d2") <= r * r, 1L).otherwise(0L)), lit(0L))
      .as(s"p$r"))
    val counts = cand.agg(aggs.head, aggs.tail: _*)
    val perR = radii.map(r => struct(lit(r).as("r"),
      col(s"p$r").as("p")))
    counts.crossJoin(broadcast(tot))
      .select(col("n"), explode(array(perR: _*)).as("e"))
      .select(col("e.r").as("r"), col("n").as("n_points"),
        // Decimal(38,0) ladder: 10⁶·A·2·P brushes past 2^63 once
        // P ≳ 7·10⁴ at A = 6.4·10⁷; IntegralDivide on decimals → Long
        col("e.p").as("n_pairs"),
        expr(s"(cast(1000000 as decimal(38,0)) * $area * 2 * e.p)" +
          " div (n * (n - 1))").as("k_e6"))
  }

  /** Knox space-time interaction test — are events that are close in
    * SPACE also disproportionately close in TIME (outbreak/burst
    * detection over the crawl)? Exact integer counts over unordered
    * pairs:
    *
    *   n_s  = pairs with d² ≤ r²          (space-close)
    *   n_t  = pairs with |Δday| ≤ tau     (time-close)
    *   n_st = pairs close in BOTH         (the Knox statistic)
    *   ratio_e6 = trunc(10⁶·n_st·n_pairs / (n_s·n_t)) — observed over
    *   expected-under-independence, 10⁶ = no interaction
    *
    * Scale shape: n_st and n_s reuse the bucketed 3×3 candidate join
    * (distance-bounded by construction, never all-pairs); n_t needs no
    * pair enumeration at all — per-day counts give
    * Σ_d c_d·(c_d−1)/2 + Σ_{0<δ≤tau} Σ_d c_d·c_{d+δ}, a day-support-
    * sized self-join; n_pairs = n(n−1)/2 is closed-form. One row out. */
  def knox(pts: DataFrame, idCol: String, xCol: String, yCol: String,
           dayCol: String, r: Long, tau: Long, maxR: Long): DataFrame = {
    require(r > 0 && r <= maxR && tau >= 0, "need 0 < r <= maxR, tau >= 0")
    val p = pts.select(col(idCol).as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
        col(dayCol).cast("long").as("day"))
      .transform(graft.spark.PersistTracker.persist)
    val tot = p.agg(count(lit(1)).as("n"))
    val bucketed = p.select(col("id").as("idB"), col("x").as("xb"),
      col("y").as("yb"), col("day").as("dayB"),
      expr(s"x div $maxR").as("gx"), expr(s"y div $maxR").as("gy"))
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    val probes = p.select(col("id").as("idA"), col("x").as("xa"),
        col("y").as("ya"), col("day").as("dayA"),
        explode(typedLit(offsets)).as("o"),
        expr(s"x div $maxR").as("g0x"), expr(s"y div $maxR").as("g0y"))
      .select(col("idA"), col("xa"), col("ya"), col("dayA"),
        (col("g0x") + col("o._1")).as("gx"),
        (col("g0y") + col("o._2")).as("gy"))
    val spacePairs = probes.join(bucketed, Seq("gx", "gy"))
      .where(col("idA") < col("idB"))
      .where((col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")) <= r * r)
      .agg(coalesce(sum(lit(1L)), lit(0L)).as("n_s"),
        coalesce(sum(when(abs(col("dayA") - col("dayB")) <= tau, 1L)
          .otherwise(0L)), lit(0L)).as("n_st"))
    // time-close pairs from per-day counts: same-day C(c,2) plus the
    // 0<δ≤tau day-offset products — day-support-sized, never pair-sized
    val byDay = p.groupBy("day").agg(count(lit(1)).as("c"))
      .transform(graft.spark.PersistTracker.persist)
    val sameDay = byDay.agg(
      coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as("t0"))
    val crossDay = byDay.as("a")
      .join(byDay.as("b"),
        col("b.day") > col("a.day") && col("b.day") <= col("a.day") + tau)
      .agg(coalesce(sum(col("a.c") * col("b.c")), lit(0L)).as("t1"))
    spacePairs.crossJoin(broadcast(tot)).crossJoin(broadcast(sameDay))
      .crossJoin(broadcast(crossDay))
      .select(col("n").as("n_points"),
        expr("n * (n - 1) div 2").as("n_pairs"),
        col("n_s"), (col("t0") + col("t1")).as("n_t"), col("n_st"),
        when(col("n_s") === 0L || col("t0") + col("t1") === 0L, 0L)
          .otherwise(expr(
            "(cast(1000000 as decimal(38,0)) * n_st * (n * (n - 1) div 2))" +
              " div (n_s * (t0 + t1))")).as("ratio_e6"))
  }
}
