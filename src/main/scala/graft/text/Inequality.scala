package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distribution statistics over grouped integer measures — the
  * corpus-governance companions to the drift monitors (q161, q133): the
  * Gini coefficient answers "how concentrated is the crawl on few
  * domains?", the two-sample Kolmogorov–Smirnov distance answers "did the
  * length/quality distribution shift between slices?" — both in exact
  * integer arithmetic so the oracle matches bit-for-bit.
  *
  * Scale shape (both): the only data-sized exchange is a keyed groupBy
  * with map-side partials; every window runs over the aggregated VALUE
  * SUPPORT (distinct measure values), never over entities. Ranking 10⁸
  * domains needs no 10⁸-row sort: domains with equal count are a tie
  * group, and the rank-weighted sum Σ rank·x over a tie group has the
  * closed form v·(m·R + m(m+1)/2) with R = #entities below — so the
  * window input is |distinct counts| rows (heavy-tailed corpora: tiny),
  * the q123/q204 support-bounded discipline.
  */
object Inequality {

  /** Gini coefficient of the per-key counts of `df` grouped by `keyCol`,
    * in exact integer micro-units. Returns ONE row
    * (n_keys, n_items, gini_e6): with x_(1)≤…≤x_(n) the sorted counts,
    *   G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx),  gini_e6 = trunc(10⁶·G).
    * Σ i·x_(i) is tie-order-invariant, computed per tie group as above. */
  def giniByKey(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("c"))
    val groups = counts.groupBy("c").agg(count(lit(1)).as("m"))
    // exclusive prefix of group sizes over ascending value — support-bounded
    val w = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = groups.withColumn("r", coalesce(sum("m").over(w), lit(0L)))
      .select(col("c"), col("m"), col("r"),
        // m(m+1) is even, so `div 2` is exact; all-integer throughout
        expr("c * (m * r + m * (m + 1) div 2)").as("six"))
    ranked.agg(sum("m").as("n"), sum(col("c") * col("m")).as("sx"),
        sum("six").as("si"))
      .select(col("n").as("n_keys"), col("sx").as("n_items"),
        expr("(1000000 * (2 * si - (n + 1) * sx)) div (n * sx)")
          .as("gini_e6"))
  }

  /** Theil T inequality with between/within decomposition — the grouped
    * sibling of [[giniByKey]] (Theil is additively decomposable; Gini is
    * not): for entities i with integer masses x_i, total X, count n,
    *
    *   T = Σ (x_i/X)·ln(n·x_i/X)
    *     = round per entity: lr_micro = round(ln(n·x_i / X)·10⁶),
    *       t_micro = Σ x_i·lr_micro div X        (Decimal sum, one div)
    *
    * Output one row per group `g` (within-group Theil over that group's
    * entities), one `__between` row (Theil over group totals — how much
    * inequality the grouping itself explains) and one `__total` row
    * (ungrouped Theil over all entities); each row carries its own exact
    * ladder. The float decomposition identity T ≈ T_between + Σ
    * (X_g/X)·T_g holds only pre-quantization, so the three faces are
    * reported, not `require`d.
    *
    * Scale shape: one keyed (group, entity) count groupBy with map-side
    * partials; every later aggregate is group- or entity-support-sized;
    * one ln round per entity (the idf discipline); no window. */
  def theilByGroup(df: DataFrame, keyCol: String, groupCol: String)
      : DataFrame = {
    val counts = df.groupBy(col(groupCol).as("g"), col(keyCol).as("k"))
      .agg(count(lit(1)).as("x"))
      .transform(graft.spark.PersistTracker.persist)
    def theil(entities: DataFrame, label: Column): DataFrame = {
      // entities: (g, x) — one row per entity within its (possibly
      // synthetic) group; ladder is per-group
      val tot = entities.groupBy("g")
        .agg(count(lit(1)).as("n"), sum("x").as("xt"))
      entities.join(tot, "g")
        .select(col("g"), col("x"), col("n"), col("xt"),
          round(log((col("n") * col("x")).cast("double") / col("xt")) * 1e6,
            0).cast("long").as("lr"))
        .groupBy("g", "n", "xt")
        .agg(sum((col("x") * col("lr")).cast("decimal(38,0)")).as("t"))
        .select(label.as("slice"), col("n").as("n_keys"),
          col("xt").as("n_items"), expr("t div xt").as("theil_micro"))
    }
    val within = theil(counts.select(col("g"), col("x")), col("g"))
    val between = theil(
      counts.groupBy("g").agg(sum("x").as("x"))
        .select(lit("__between").as("g"), col("x")), col("g"))
    val total = theil(
      counts.select(lit("__total").as("g"), col("x")), col("g"))
    within.unionByName(between).unionByName(total)
  }

  /** Add-1-smoothed Kullback–Leibler divergence KL(P‖Q) between the term
    * distributions of slice 0 (P) and slice 1 (Q) of `df`, in micro-nats.
    * With union vocabulary V and slice totals N1/N2, every union term
    * contributes p·ln(p/q) with p = (c1+1)/(N1+V), q = (c2+1)/(N2+V):
    *
    *   lr_micro = round(ln( ((c1+1)·(N2+V)) / ((c2+1)·(N1+V)) )·10⁶)
    *   kl_micro = Σ (c1+1)·lr_micro  div  (N1+V)
    *
    * One double op per DISTINCT term (the established idf micro-round —
    * the log argument is a ratio of exact integers, so both engines see
    * the same double); the weighted sum is carried in Decimal(38,0) and
    * divided once. Returns ONE row (v_size, n1, n2, kl_micro).
    *
    * Scale shape: tokenize → one vocabulary-keyed groupBy with map-side
    * partials; the totals are a 1-row aggregate broadcast back; no window,
    * no sort, final result one row. */
  def klSmoothed(df: DataFrame, termCol: String, sliceCol: String)
      : DataFrame = {
    val byW = df.groupBy(col(termCol).as("w"))
      .agg(sum(when(col(sliceCol) === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col(sliceCol) === 1, 1L).otherwise(0L)).as("c2"))
    val tot = byW.agg(count(lit(1)).as("v"),
      sum("c1").as("n1"), sum("c2").as("n2"))
    val terms = byW.crossJoin(broadcast(tot))
      .select(col("v"), col("n1"), col("n2"), col("c1"),
        round(log(((col("c1") + 1).cast("double") * (col("n2") + col("v"))) /
          ((col("c2") + 1).cast("double") * (col("n1") + col("v")))) * 1e6, 0)
          .cast("long").as("lr_micro"))
    terms.groupBy("v", "n1", "n2")
      .agg(sum(((col("c1") + 1) * col("lr_micro")).cast("decimal(38,0)"))
        .as("t"))
      .select(col("v").as("v_size"), col("n1"), col("n2"),
        expr("t div (n1 + v)").as("kl_micro"))
  }

  /** Exact two-sample Kolmogorov–Smirnov distance between the integer
    * `valueCol` distributions of the rows where `sliceCol` = 0 vs = 1.
    * Returns ONE row (n1, n2, ks_e6, ks_at):
    *   D = max_v |F1(v) − F2(v)|, ks_e6 = trunc(10⁶·max|C1(v)·n2 − C2(v)·n1|
    *   / (n1·n2)), ks_at = smallest v attaining the max.
    * Cumulative counts C are exact Longs; the single division happens once
    * on the final scalar. The cumulative window runs over the merged value
    * support (distinct values of a bounded measure — document lengths,
    * scores), not over documents. */
  def ksTwoSample(df: DataFrame, valueCol: String,
                  sliceCol: String): DataFrame = {
    val byV = df.groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(sliceCol) === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col(sliceCol) === 1, 1L).otherwise(0L)).as("c2"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = byV.select(col("v"),
      sum("c1").over(w).as("k1"), sum("c2").over(w).as("k2"))
    val tot = byV.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val diffs = cum.crossJoin(broadcast(tot))
      .select(col("v"), col("n1"), col("n2"),
        abs(col("k1") * col("n2") - col("k2") * col("n1")).as("gap"))
    // argmax with deterministic tie-break: min v among max-gap rows — one
    // struct-max aggregate, no second pass
    diffs.agg(max(struct(col("gap"), (-col("v")).as("nv"),
        col("n1"), col("n2"))).as("m"))
      .select(col("m.n1").as("n1"), col("m.n2").as("n2"),
        expr("(1000000 * m.gap) div (m.n1 * m.n2)").as("ks_e6"),
        (-col("m.nv")).as("ks_at"))
  }
}
