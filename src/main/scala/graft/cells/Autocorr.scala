package graft.cells

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global Moran's I — spatial autocorrelation of a per-cell statistic over
  * the modeling grid, queen (8-neighbor) contiguity with binary weights.
  * The standard QA companion to the surrogate pipeline: after allocation,
  * Moran's I over the per-cell page (or emission) density says whether the
  * spatial pattern is clustered (I→1), random (I≈-1/(N-1)), or dispersed
  * (I→-1) — the reference's QA layer reports per-county sums
  * (`SurrogateTools` QA reports); this is the grid-side analogue.
  *
  *   I = (N / W) · Σ_ij w_ij·d_i·d_j / Σ_i d_i²,  d_i = x_i − x̄
  *
  * Numeric discipline: with integer cell counts x_i, multiply through by N:
  * D_i = N·x_i − S (exact Long), and every sum is carried in Decimal(38,0)
  * (Σ D_i² can brush Long range at large counts). The single division is
  * performed ONCE on the final 1-row aggregate in exact BigInteger
  * arithmetic, truncated toward zero — bit-identical to DuckDB's HUGEINT
  * `//`.
  *
  * Scale shape: counts aggregate on (cx, cy) — one keyed shuffle of the
  * point stream with map-side partials; the lattice (a generated
  * ncols×nrows range, never a shuffle) left-joins the counts so EMPTY
  * cells carry d = −x̄ like any other cell; adjacency is an 8-offset
  * posexplode + self EQUI-join on the cells table (grid-sized, not
  * point-sized); the result is a 1-row aggregate. No window, no sort, no
  * per-point pairwise work — at 10^12 points the only data-sized exchange
  * is the count groupBy.
  */
object Autocorr {

  /** Per-cell counts of `pts` on a `ncols`×`nrows` lattice (cell ids in
    * `cxCol`/`cyCol`, 0-based), then global Moran's I over those counts.
    * Returns ONE row: (n_cells, w_pairs, n_points, morans_e6) where
    * morans_e6 = trunc(10⁶·I). */
  def moransI(pts: DataFrame, cxCol: String, cyCol: String,
              ncols: Int, nrows: Int): DataFrame =
    moransIFromCounts(
      pts.groupBy(col(cxCol).as("cx"), col(cyCol).as("cy"))
        .agg(count(lit(1)).as("c")),
      ncols, nrows)

  /** [[moransI]] from an already-aggregated per-cell count table
    * (cx, cy, c) — the entry point for INCREMENTALLY MAINTAINED counts
    * (a CDF delta folded into the previous counts), where the point
    * stream is never re-scanned. */
  def moransIFromCounts(counts: DataFrame, ncols: Int, nrows: Int)
      : DataFrame = {
    val spark = counts.sparkSession
    val lattice = spark.range(ncols.toLong * nrows)
      .select((col("id") % ncols).as("cx"), expr(s"id div $ncols").as("cy"))
    val cells = lattice.join(counts, Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"), coalesce(col("c"), lit(0L)).as("n"))
    val tot = cells.agg(sum("n").as("s"), count(lit(1)).as("nc"))
    // deviations ×N: D_i = N·n_i − S, exact; Decimal(38,0) for the squares
    val d = cells.crossJoin(broadcast(tot))
      .select(col("cx"), col("cy"), col("nc"), col("s"),
        (col("nc") * col("n") - col("s")).cast("decimal(38,0)").as("d"))
      .transform(graft.spark.PersistTracker.persist) // feeds pairs AND den
    val offsets = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1),
      (0, 1), (1, -1), (1, 0), (1, 1))
    val withNbr = d.select(col("cx"), col("cy"), col("d"),
        explode(typedLit(offsets)).as("o"))
      .select((col("cx") + col("o._1")).as("nx"),
        (col("cy") + col("o._2")).as("ny"), col("d").as("da"))
    // inner equi-join drops off-lattice neighbors — border cells simply
    // contribute fewer pairs, the standard queen-contiguity edge rule
    val pairs = withNbr.join(
      d.select(col("cx").as("nx"), col("cy").as("ny"), col("d").as("db")),
      Seq("nx", "ny"))
    val agg = pairs.agg(count(lit(1)).as("w"),
      sum(col("da") * col("db")).as("num"))
    val den = d.agg(max("nc").as("nc"), max("s").as("s"),
      sum(col("d") * col("d")).as("den"))
    den.crossJoin(agg).select(
      col("nc").as("n_cells"), col("w").as("w_pairs"),
      col("s").as("n_points"),
      moransE6(col("nc"), col("w"), col("num"), col("den")).as("morans_e6"))
  }

  /** Geary's C — the contiguity-based dispersion companion of Moran's I
    * (C < 1 clustered, C = 1 random, C > 1 dispersed; Geary weights
    * LOCAL differences where Moran weights covariance, so the pair is
    * the standard report):
    *
    *   C = (N−1)·Σ_ij w_ij (x_i−x_j)² / (2W·Σ (x_i−x̄)²)
    *
    * With the same ×N deviations D_i = N·x_i − S, (x_i−x_j)² scales to
    * (D_i−D_j)²/N², which cancels against the denominator's D²/N² —
    * so geary_e6 = trunc(10⁶·(N−1)·Σ(D_i−D_j)² / (2W·ΣD_i²)), carried
    * in Decimal(38,0) with ONE exact BigInteger division at the end.
    * Same one-shuffle shape as [[moransI]]. */
  def gearyC(pts: DataFrame, cxCol: String, cyCol: String,
             ncols: Int, nrows: Int): DataFrame = {
    val spark = pts.sparkSession
    val counts = pts.groupBy(col(cxCol).as("cx"), col(cyCol).as("cy"))
      .agg(count(lit(1)).as("c"))
    val lattice = spark.range(ncols.toLong * nrows)
      .select((col("id") % ncols).as("cx"), expr(s"id div $ncols").as("cy"))
    val cells = lattice.join(counts, Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"), coalesce(col("c"), lit(0L)).as("n"))
    val tot = cells.agg(sum("n").as("s"), count(lit(1)).as("nc"))
    val d = cells.crossJoin(broadcast(tot))
      .select(col("cx"), col("cy"), col("nc"), col("s"),
        (col("nc") * col("n") - col("s")).cast("decimal(38,0)").as("d"))
      .transform(graft.spark.PersistTracker.persist)
    val offsets = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1),
      (0, 1), (1, -1), (1, 0), (1, 1))
    val withNbr = d.select(col("cx"), col("cy"), col("d"),
        explode(typedLit(offsets)).as("o"))
      .select((col("cx") + col("o._1")).as("nx"),
        (col("cy") + col("o._2")).as("ny"), col("d").as("da"))
    val pairs = withNbr.join(
      d.select(col("cx").as("nx"), col("cy").as("ny"), col("d").as("db")),
      Seq("nx", "ny"))
    val agg = pairs.agg(count(lit(1)).as("w"),
      sum((col("da") - col("db")) * (col("da") - col("db"))).as("num"))
    val den = d.agg(max("nc").as("nc"), max("s").as("s"),
      sum(col("d") * col("d")).as("den"))
    den.crossJoin(agg).select(
      col("nc").as("n_cells"), col("w").as("w_pairs"),
      col("s").as("n_points"),
      gearyE6(col("nc"), col("w"), col("num"), col("den")).as("geary_e6"))
  }

  private val gearyE6Udf = udf(
    (nc: Long, w: Long, num: java.math.BigDecimal,
     den: java.math.BigDecimal) => {
      val denB = den.toBigInteger
        .multiply(java.math.BigInteger.valueOf(2L * w))
      if (denB.signum() == 0) 0L
      else num.toBigInteger
        .multiply(java.math.BigInteger.valueOf(1000000L * (nc - 1)))
        .divide(denB).longValueExact()
    })

  private def gearyE6(nc: Column, w: Column, num: Column, den: Column) =
    gearyE6Udf(nc, w, num, den)

  /** Local Moran's I (LISA) quadrants — the per-cell decomposition of
    * [[moransI]]: with the same ×N deviations D_i = N·x_i − S and queen
    * contiguity, each cell's spatial lag is L_i = Σ_{j∈nbr(i)} D_j and
    * its (unscaled) local statistic D_i·L_i; the Anselin quadrant is
    * HH (hot spot) when D_i>0 ∧ L_i>0, LL (cold spot), HL/LH (outliers),
    * NS when either side is exactly 0. Everything is exact Long/Decimal
    * integer arithmetic — no division, no float, bit-identical anywhere.
    *
    * Scale shape: identical to [[moransI]] — one keyed count groupBy of
    * the point stream, then grid-sized joins only; the result is one row
    * per lattice cell. */
  def localMorans(pts: DataFrame, cxCol: String, cyCol: String,
                  ncols: Int, nrows: Int): DataFrame = {
    val spark = pts.sparkSession
    val counts = pts.groupBy(col(cxCol).as("cx"), col(cyCol).as("cy"))
      .agg(count(lit(1)).as("c"))
    val lattice = spark.range(ncols.toLong * nrows)
      .select((col("id") % ncols).as("cx"), expr(s"id div $ncols").as("cy"))
    val cells = lattice.join(counts, Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"), coalesce(col("c"), lit(0L)).as("n"))
    val tot = cells.agg(sum("n").as("s"), count(lit(1)).as("nc"))
    val d = cells.crossJoin(broadcast(tot))
      .select(col("cx"), col("cy"),
        (col("nc") * col("n") - col("s")).as("d"))
      .transform(graft.spark.PersistTracker.persist)
    val offsets = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1),
      (0, 1), (1, -1), (1, 0), (1, 1))
    val lag = d.select(col("cx"), col("cy"),
        explode(typedLit(offsets)).as("o"), col("d"))
      .select((col("cx") + col("o._1")).as("nx"),
        (col("cy") + col("o._2")).as("ny"), col("d").as("dn"))
      .groupBy(col("nx").as("cx"), col("ny").as("cy"))
      .agg(sum("dn").as("lag"))
    d.join(lag, Seq("cx", "cy"), "left") // corner-complete: lattice keyed
      .select(col("cx"), col("cy"), col("d"),
        coalesce(col("lag"), lit(0L)).as("lag"))
      .withColumn("lisa",
        (col("d").cast("decimal(38,0)") * col("lag")).cast("decimal(38,0)"))
      .withColumn("quad",
        when(col("d") > 0 && col("lag") > 0, "HH")
          .when(col("d") < 0 && col("lag") < 0, "LL")
          .when(col("d") > 0 && col("lag") < 0, "HL")
          .when(col("d") < 0 && col("lag") > 0, "LH")
          .otherwise("NS"))
  }

  /** trunc(10⁶·N·num / (W·den)) in exact BigInteger arithmetic on the
    * 1-row final aggregate (a UDF here is outside every hot path). */
  private val moransE6Udf = udf(
    (nc: Long, w: Long, num: java.math.BigDecimal,
     den: java.math.BigDecimal) => {
      val denB = den.toBigInteger.multiply(java.math.BigInteger.valueOf(w))
      if (denB.signum() == 0) 0L
      else num.toBigInteger
        .multiply(java.math.BigInteger.valueOf(1000000L * nc))
        .divide(denB).longValueExact()
    })

  private def moransE6(nc: Column, w: Column, num: Column, den: Column) =
    moransE6Udf(nc, w, num, den)

  /** Getis–Ord Gi* hot-spot statistic per cell — the significance-style
    * companion of [[localMorans]] (Ord & Getis 1995): with binary queen
    * weights INCLUDING self (the * variant), local sum L_i and
    * neighborhood size W_i,
    *
    *   z_i = (L_i − x̄·W_i) / (S·√[(N·W_i − W_i²)/(N−1)])
    *
    * z is irrational, but z² is an exact rational in the integer counts
    * — multiply through by N²:
    *
    *   z_i² = (N·L_i − S·W_i)²·(N−1) / ((N·Σx² − S²)·(N·W_i − W_i²))
    *
    * so the operator reports `gi_sign` (hot/cold/zero) and
    * `zsq_e6 = trunc(10⁶·z²)` — bit-identical anywhere, no float, no
    * √. Hot spots at |z| > 1.96 are exactly `zsq_e6 > 3_841_600 ∧
    * gi_sign = 1`.
    *
    * Scale shape: identical to [[localMorans]] — one keyed count
    * groupBy of the point stream, then grid-sized 9-offset explode +
    * equi-join + keyed agg; the exact BigInteger division runs once per
    * GRID cell (bounded by the modeling grid, not the data). */
  def getisGiStar(pts: DataFrame, cxCol: String, cyCol: String,
                  ncols: Int, nrows: Int): DataFrame = {
    val spark = pts.sparkSession
    val counts = pts.groupBy(col(cxCol).as("cx"), col(cyCol).as("cy"))
      .agg(count(lit(1)).as("c"))
    val lattice = spark.range(ncols.toLong * nrows)
      .select((col("id") % ncols).as("cx"), expr(s"id div $ncols").as("cy"))
    val cells = lattice.join(counts, Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"), coalesce(col("c"), lit(0L)).as("n"))
      .transform(graft.spark.PersistTracker.persist) // tot + gather ×2
    val tot = cells.agg(sum("n").as("s"), count(lit(1)).as("nc"),
      sum(col("n").cast("decimal(38,0)") * col("n")).as("ss"))
    val offsets = Seq((0, 0), (-1, -1), (-1, 0), (-1, 1), (0, -1),
      (0, 1), (1, -1), (1, 0), (1, 1)) // self + queen
    val loc = cells.select(col("cx"), col("cy"),
        explode(typedLit(offsets)).as("o"))
      .select(col("cx"), col("cy"),
        (col("cx") + col("o._1")).as("nx"), (col("cy") + col("o._2")).as("ny"))
      .join(cells.select(col("cx").as("nx"), col("cy").as("ny"),
        col("n").as("zn")), Seq("nx", "ny"))
      .groupBy("cx", "cy")
      .agg(sum("zn").as("l"), count(lit(1)).as("w"))
    loc.crossJoin(broadcast(tot)).select(
      col("cx"), col("cy"), col("w").as("w_i"), col("l").as("local_sum"),
      (col("nc").cast("decimal(38,0)") * col("l") -
        col("s").cast("decimal(38,0)") * col("w")).as("num"),
      (col("nc").cast("decimal(38,0)") * col("ss") -
        col("s").cast("decimal(38,0)") * col("s")).as("den_a"),
      (col("nc") * col("w") - col("w") * col("w")).as("den_b"),
      col("nc"))
      .select(col("cx"), col("cy"), col("w_i"), col("local_sum"),
        when(col("num") > 0, lit(1L)).when(col("num") < 0, lit(-1L))
          .otherwise(lit(0L)).as("gi_sign"),
        giStarE6Udf(col("nc"), col("num"), col("den_a"), col("den_b"))
          .as("zsq_e6"))
  }

  private val giStarE6Udf = udf(
    (nc: Long, num: java.math.BigDecimal, denA: java.math.BigDecimal,
     denB: Long) => {
      val den = denA.toBigInteger
        .multiply(java.math.BigInteger.valueOf(denB))
      if (den.signum() == 0) 0L
      else {
        val n = num.toBigInteger
        n.multiply(n)
          .multiply(java.math.BigInteger.valueOf(1000000L * (nc - 1)))
          .divide(den).longValueExact()
      }
    })
}
