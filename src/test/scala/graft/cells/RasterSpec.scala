package graft.cells

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Closed-form checks for the raster-algebra toolkit. */
class RasterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("raster-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def df(counts: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    counts.toDF("cx", "cy", "c").repartition(3)
  }

  test("bilinearRefine: a constant field refines to the constant " +
       "(16·c everywhere), total mass is conserved ×16") {
    val flat = for (x <- 0L until 4L; y <- 0L until 4L) yield (x, y, 5L)
    val got = Raster.bilinearRefine(df(flat.toSeq), 4, 4).collect()
    graft.spark.PersistTracker.drain()
    assert(got.length === 64)
    assert(got.forall(_.getLong(2) === 80L)) // 16·5
  }

  test("bilinearRefine: single spike spreads exactly its {9,3,3,1}/16 " +
       "taps; border replication doubles edge weight") {
    // spike of 16 at (0,0) on a 2×2 grid: fine (0,0) has ix=ox=0, iy=oy=0
    // (clamped) → all 4 taps hit the spike: v16 = 16·16
    val got = Raster.bilinearRefine(df(Seq((0L, 0L, 16L))), 2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    graft.spark.PersistTracker.drain()
    assert(got((0L, 0L)) === 256L)       // (9+3+3+1)·16, full clamp
    // fine (1,0): ix=0, px=1 → ox=1 (c=0); iy=0, py=0 → oy=0 (clamped,
    // same cell) — taps (0,0,9)+(1,0,3)+(0,0,3)+(1,0,1) → (9+3)·16 = 192
    assert(got((1L, 0L)) === 192L)
    // fine (2,0): ix=1 (c=0) wx=3/4, ox=0 (c=16) wx=1/4 → 256/4 = 64
    assert(got((2L, 0L)) === 64L)
    assert(got((3L, 3L)) === 0L)
    // separable form: v16 = 256·wx0(fx)·wy0(fy) with wx0 = 1, 3/4, 1/4, 0
    // across fx = 0..3 (border replication folds the clamped tap onto the
    // edge) — total mass 256·(1+3/4+1/4)² = 1024
    assert(got.values.sum === 1024L)
  }

  test("morphOpen: lone speck erased, solid 3x3 block survives opening") {
    // block at (1..3)×(1..3) all dense, speck at (6,6)
    val counts = (for (x <- 1L to 3L; y <- 1L to 3L) yield (x, y, 5L)) :+
      ((6L, 6L, 5L))
    val got = Raster.morphOpen(df(counts.toSeq), 8, 8, threshold = 3L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    graft.spark.PersistTracker.drain()
    assert(got((6L, 6L)) === ((1L, 0L)))       // speck: dense, NOT opened
    for (x <- 1L to 3L; y <- 1L to 3L)
      assert(got((x, y)) === ((1L, 1L)))       // block fully survives
    assert(got((0L, 0L))._1 === 0L)
    assert(got((5L, 5L)) === ((0L, 0L)))       // near-speck stays off
  }

  test("marchingSquares: a single dense cell yields the four single-" +
       "corner cases once each, everything else empty") {
    val got = Raster.marchingSquares(df(Seq((1L, 1L, 9L))), 4, 4,
        threshold = 3L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.spark.PersistTracker.drain()
    // dense (1,1) is corner c11 of block (0,0) → case 8; c10 of (0,1)?
    // orientation: block (bx,by) corners (bx+dx, by+dy): (1,1) appears in
    // blocks (0,0) as bit 8, (1,0) as bit 4, (0,1) as bit 2, (1,1) as
    // bit 1 — each exactly once
    assert(got(8L) === ((1L, 1L)))
    assert(got(4L) === ((1L, 1L)))
    assert(got(2L) === ((1L, 1L)))
    assert(got(1L) === ((1L, 1L)))
    assert(got(0L) === ((5L, 0L)))  // 9 blocks − 4 touched = 5 empty
    assert(got.keySet === Set(0L, 1L, 2L, 4L, 8L))
  }

  test("marchingSquares: a full mask is all case 15 with zero segments; " +
       "a checkerboard is all saddles with two segments each") {
    val full = for (x <- 0L until 3L; y <- 0L until 3L) yield (x, y, 9L)
    val gotF = Raster.marchingSquares(df(full.toSeq), 3, 3, 3L).collect()
    graft.spark.PersistTracker.drain()
    assert(gotF.toSeq.map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))) === Seq((15L, 4L, 0L)))
    val checker = for (x <- 0L until 3L; y <- 0L until 3L
      if (x + y) % 2 == 0) yield (x, y, 9L)
    val gotC = Raster.marchingSquares(df(checker.toSeq), 3, 3, 3L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    graft.spark.PersistTracker.drain()
    assert(gotC.keySet === Set(6L, 9L)) // the two diagonal saddle patterns
    assert(gotC.values.forall { case (b, s) => s === 2L * b })
  }
}
