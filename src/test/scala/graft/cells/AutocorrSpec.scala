package graft.cells

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Brute-force parity for the exact-integer distribution statistics:
  * Moran's I (graft.cells.Autocorr), Gini and two-sample KS
  * (graft.text.Inequality). Each reference implementation below is the
  * naive entity-level formula in BigInt/double — the operators must match
  * it bit-for-bit after the same 10^6 truncation. */
class AutocorrSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("autocorr-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Naive Moran's I over an n×n lattice of counts, exact BigInt ladder:
    * trunc(10^6 · N · Σw_ij D_i D_j / (W · Σ D_i²)), D_i = N·x_i − S. */
  private def bruteMorans(counts: Map[(Int, Int), Long], n: Int)
      : (Long, Long, Long) = {
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (x, y) -> counts.getOrElse((x, y), 0L)
    val nc = BigInt(cells.size)
    val s = BigInt(cells.map(_._2).sum)
    val d = cells.map { case (k, v) => k -> (nc * v - s) }.toMap
    val off = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1),
      (0, 1), (1, -1), (1, 0), (1, 1))
    var w = 0L; var num = BigInt(0)
    for (((x, y), da) <- d; (dx, dy) <- off) {
      d.get((x + dx, y + dy)).foreach { db => w += 1; num += da * db }
    }
    val den = d.values.map(v => v * v).sum
    val i = if (den == 0 || w == 0) BigInt(0)
            else BigInt(1000000) * nc * num / (BigInt(w) * den)
    (w, s.toLong, i.toLong)
  }

  private def runMorans(counts: Map[(Int, Int), Long], n: Int)
      : (Long, Long, Long) = {
    val s = spark
    import s.implicits._
    val pts = counts.toSeq.flatMap { case ((x, y), c) =>
      Seq.fill(c.toInt)((x.toLong, y.toLong)) }
      .toDF("cx", "cy").repartition(4)
    val r = Autocorr.moransI(pts, "cx", "cy", n, n).collect()(0)
    graft.spark.PersistTracker.drain()
    (r.getAs[Long]("w_pairs"), r.getAs[Long]("n_points"),
      r.getAs[Long]("morans_e6"))
  }

  test("moransI: block cluster is positive, checkerboard negative, " +
       "both exactly matching the brute BigInt ladder") {
    // 4×4 block of mass in one corner of an 8×8 lattice → clustered
    val block = (for (x <- 0 until 4; y <- 0 until 4)
      yield (x, y) -> 5L).toMap
    val gotB = runMorans(block, 8)
    assert(gotB === bruteMorans(block, 8))
    assert(gotB._3 > 300000, s"cluster should be strongly positive: $gotB")
    // checkerboard on 4×4 → dispersed (negative)
    val checker = (for (x <- 0 until 4; y <- 0 until 4
      if (x + y) % 2 == 0) yield (x, y) -> 3L).toMap
    val gotC = runMorans(checker, 4)
    assert(gotC === bruteMorans(checker, 4))
    // under queen contiguity the 4 diagonal neighbors are same-colored,
    // so a checkerboard is only mildly dispersed — sign is what matters
    assert(gotC._3 < 0, s"checkerboard should be negative: $gotC")
  }

  test("moransI: irregular counts match brute force and are " +
       "partition-invariant") {
    val rnd = new scala.util.Random(7)
    val counts = (for (x <- 0 until 6; y <- 0 until 6 if rnd.nextBoolean())
      yield (x, y) -> (rnd.nextInt(9) + 1).toLong).toMap
    assert(runMorans(counts, 6) === bruteMorans(counts, 6))
  }

  test("gearyC: matches the brute BigInt ladder; clustered mass is " +
       "C < 1, checkerboard C > 1") {
    def bruteGeary(counts: Map[(Int, Int), Long], n: Int): Long = {
      val cells = for (x <- 0 until n; y <- 0 until n)
        yield (x, y) -> counts.getOrElse((x, y), 0L)
      val nc = BigInt(cells.size); val s = BigInt(cells.map(_._2).sum)
      val d = cells.map { case (k, v) => k -> (nc * v - s) }.toMap
      val off = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1),
        (0, 1), (1, -1), (1, 0), (1, 1))
      var w = 0L; var num = BigInt(0)
      for (((x, y), da) <- d; (dx, dy) <- off)
        d.get((x + dx, y + dy)).foreach { db =>
          w += 1; num += (da - db) * (da - db) }
      val den = d.values.map(v => v * v).sum
      if (den == 0 || w == 0) 0L
      else (BigInt(1000000) * (nc - 1) * num / (BigInt(2 * w) * den))
        .toLong
    }
    def run(counts: Map[(Int, Int), Long], n: Int): Long = {
      val s = spark
      import s.implicits._
      val pts = counts.toSeq.flatMap { case ((x, y), c) =>
        Seq.fill(c.toInt)((x.toLong, y.toLong)) }
        .toDF("cx", "cy").repartition(4)
      val r = Autocorr.gearyC(pts, "cx", "cy", n, n).collect()(0)
      graft.spark.PersistTracker.drain()
      r.getAs[Long]("geary_e6")
    }
    val block = (for (x <- 0 until 3; y <- 0 until 3)
      yield (x, y) -> 4L).toMap
    val gB = run(block, 6)
    assert(gB === bruteGeary(block, 6))
    assert(gB < 1000000L, s"clustered should be C < 1: $gB")
    val checker = (for (x <- 0 until 4; y <- 0 until 4
      if (x + y) % 2 == 0) yield (x, y) -> 3L).toMap
    val gC = run(checker, 4)
    assert(gC === bruteGeary(checker, 4))
    assert(gC > 1000000L, s"checkerboard should be C > 1: $gC")
  }

  private def bruteGini(xs: Seq[Long]): Long = {
    val s = xs.sorted
    val n = BigInt(s.size)
    val sx = BigInt(s.sum)
    val si = s.zipWithIndex.map { case (v, i) => BigInt(i + 1) * v }.sum
    (BigInt(1000000) * (2 * si - (n + 1) * sx) / (n * sx)).toLong
  }

  test("giniByKey: tie-group rank formula matches the entity-level sort; " +
       "uniform counts give 0") {
    val s = spark
    import s.implicits._
    // keys with counts 1,1,2,3,3,3,8 — heavy ties exercise the closed form
    val counts = Seq(1L, 1L, 2L, 3L, 3L, 3L, 8L)
    val rows = counts.zipWithIndex.flatMap { case (c, k) =>
      Seq.fill(c.toInt)(k.toLong) }
    val got = graft.text.Inequality
      .giniByKey(rows.toDF("k"), "k").collect()(0)
    assert(got.getAs[Long]("n_keys") === 7L)
    assert(got.getAs[Long]("n_items") === counts.sum)
    assert(got.getAs[Long]("gini_e6") === bruteGini(counts))
    // perfectly uniform → 0
    val uni = (0L until 5L).flatMap(k => Seq.fill(4)(k))
    assert(graft.text.Inequality.giniByKey(uni.toDF("k"), "k")
      .collect()(0).getAs[Long]("gini_e6") === 0L)
  }

  /** Naive KS: max over merged support of |C1·n2 − C2·n1|, smallest
    * attaining value. */
  private def bruteKs(a: Seq[Long], b: Seq[Long]): (Long, Long) = {
    val n1 = a.size.toLong; val n2 = b.size.toLong
    val support = (a ++ b).distinct.sorted
    val gaps = support.map { v =>
      val c1 = a.count(_ <= v).toLong; val c2 = b.count(_ <= v).toLong
      (math.abs(c1 * n2 - c2 * n1), v)
    }
    val mx = gaps.map(_._1).max
    val at = gaps.filter(_._1 == mx).map(_._2).min
    (1000000L * mx / (n1 * n2), at)
  }

  test("ksTwoSample: matches brute force on shifted samples; identical " +
       "samples give 0") {
    val s = spark
    import s.implicits._
    val a = Seq(1L, 2L, 2L, 3L, 5L, 8L, 8L, 9L)
    val b = Seq(4L, 5L, 6L, 6L, 7L, 9L, 11L)
    val df = (a.map((_, 0)) ++ b.map((_, 1))).toDF("v", "slice")
    val got = graft.text.Inequality.ksTwoSample(df, "v", "slice")
      .collect()(0)
    val (ks, at) = bruteKs(a, b)
    assert(got.getAs[Long]("n1") === a.size.toLong)
    assert(got.getAs[Long]("n2") === b.size.toLong)
    assert(got.getAs[Long]("ks_e6") === ks)
    assert(got.getAs[Long]("ks_at") === at)
    val same = (a.map((_, 0)) ++ a.map((_, 1))).toDF("v", "slice")
    assert(graft.text.Inequality.ksTwoSample(same, "v", "slice")
      .collect()(0).getAs[Long]("ks_e6") === 0L)
  }
}
