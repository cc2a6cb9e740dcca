package graft.cells

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Brute-force parity for the terrain layer (Horn gradient, D8 basins)
  * and the Getis–Ord Gi* ladder — naive per-cell reference
  * implementations in plain Scala vs the grid-join operators, plus the
  * structural invariants (basins partition the lattice; descent is
  * strict along every D8 pointer). */
class TerrainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("terrain-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 6×6 fixture: a sharp peak, a ridge, a zero plateau, a second summit
    * — exercises flats (octant −1), every descent direction, ties, and
    * multiple sinks. */
  private val n = 6
  private val counts: Map[(Int, Int), Long] = Map(
    (1, 1) -> 9L, (2, 1) -> 4L, (1, 2) -> 4L, (2, 2) -> 6L,
    (3, 3) -> 2L, (4, 4) -> 7L, (4, 3) -> 3L, (3, 4) -> 3L,
    (0, 5) -> 1L, (5, 0) -> 5L, (5, 1) -> 5L)

  private def z(x: Int, y: Int): Long = counts.getOrElse((x, y), 0L)

  private def ptsDf = {
    val s = spark
    import s.implicits._
    counts.toSeq.flatMap { case ((x, y), c) =>
      Seq.fill(c.toInt)((x.toLong, y.toLong)) }
      .toDF("cx", "cy").repartition(4)
  }

  test("hornGradient matches the naive 3x3 stencil on every interior cell") {
    val got = Terrain.hornGradient(ptsDf, "cx", "cy", n, n)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    graft.spark.PersistTracker.drain()
    assert(got.size == (n - 2) * (n - 2), "interior cells only")
    for (x <- 1 until n - 1; y <- 1 until n - 1) {
      val dzdx = (z(x + 1, y - 1) + 2 * z(x + 1, y) + z(x + 1, y + 1)) -
        (z(x - 1, y - 1) + 2 * z(x - 1, y) + z(x - 1, y + 1))
      val dzdy = (z(x - 1, y + 1) + 2 * z(x, y + 1) + z(x + 1, y + 1)) -
        (z(x - 1, y - 1) + 2 * z(x, y - 1) + z(x + 1, y - 1))
      val oct =
        if (dzdx == 0 && dzdy == 0) -1L
        else if (math.abs(dzdx) >= math.abs(dzdy) && dzdx > 0 && dzdy >= 0) 0L
        else if (math.abs(dzdx) < math.abs(dzdy) && dzdy > 0 && dzdx >= 0) 1L
        else if (math.abs(dzdx) < math.abs(dzdy) && dzdy > 0) 2L
        else if (math.abs(dzdx) >= math.abs(dzdy) && dzdx < 0 && dzdy >= 0) 3L
        else if (math.abs(dzdx) >= math.abs(dzdy) && dzdx < 0) 4L
        else if (math.abs(dzdx) < math.abs(dzdy) && dzdy < 0 && dzdx <= 0) 5L
        else if (math.abs(dzdx) < math.abs(dzdy) && dzdy < 0) 6L
        else 7L
      assert(got((x.toLong, y.toLong)) ==
        ((dzdx, dzdy, dzdx * dzdx + dzdy * dzdy, oct)),
        s"cell ($x,$y)")
    }
  }

  /** Naive D8: pointer = steepest strictly-lower neighbor (tie → smallest
    * index in the fixed order), then follow chains to sinks. */
  private def bruteBasins(): Map[(Long, Long), Long] = {
    val offs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1),
      (0, 1), (1, -1), (1, 0), (1, 1))
    def ptr(x: Int, y: Int): Option[(Int, Int)] = {
      val cands = offs.zipWithIndex.flatMap { case ((dx, dy), i) =>
        val (nx, ny) = (x + dx, y + dy)
        if (nx < 0 || ny < 0 || nx >= n || ny >= n) None
        else Some((z(x, y) - z(nx, ny), i, (nx, ny)))
      }
      val best = cands.maxBy { case (dr, i, _) => (dr, -i) }
      if (best._1 > 0) Some(best._3) else None
    }
    def sink(x: Int, y: Int): (Int, Int) = ptr(x, y) match {
      case Some((nx, ny)) => sink(nx, ny)
      case None => (x, y)
    }
    val all = for (x <- 0 until n; y <- 0 until n) yield sink(x, y)
    all.groupBy(identity).map { case ((x, y), g) =>
      (x.toLong, y.toLong) -> g.size.toLong }
  }

  test("d8Basins matches the naive chain-follow and partitions the lattice") {
    val got = Terrain.d8Basins(ptsDf, "cx", "cy", n, n)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    graft.spark.PersistTracker.drain()
    assert(got == bruteBasins())
    assert(got.values.sum == n.toLong * n, "basins partition the lattice")
    // every sink is a true local minimum: no strictly lower D8 neighbor
    for (((sx, sy), _) <- got; dx <- -1 to 1; dy <- -1 to 1
         if dx != 0 || dy != 0) {
      val (nx, ny) = (sx.toInt + dx, sy.toInt + dy)
      if (nx >= 0 && ny >= 0 && nx < n && ny < n)
        assert(z(nx, ny) >= z(sx.toInt, sy.toInt),
          s"sink ($sx,$sy) has a lower neighbor ($nx,$ny)")
    }
  }

  test("getisGiStar matches the exact BigInt z-square ladder") {
    val got = Autocorr.getisGiStar(ptsDf, "cx", "cy", n, n)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    graft.spark.PersistTracker.drain()
    assert(got.size == n * n)
    val nc = BigInt(n * n)
    val s = BigInt((for (x <- 0 until n; y <- 0 until n) yield z(x, y)).sum)
    val ss = (for (x <- 0 until n; y <- 0 until n)
      yield BigInt(z(x, y)) * z(x, y)).sum
    for (x <- 0 until n; y <- 0 until n) {
      val nbrs = for {
        dx <- -1 to 1; dy <- -1 to 1
        nx = x + dx; ny = y + dy
        if nx >= 0 && ny >= 0 && nx < n && ny < n
      } yield (nx, ny)
      val w = BigInt(nbrs.size)
      val l = BigInt(nbrs.map { case (nx, ny) => z(nx, ny) }.sum)
      val num = nc * l - s * w
      val den = (nc * ss - s * s) * (nc * w - w * w)
      val zsq = if (den == 0) BigInt(0)
                else BigInt(1000000) * num * num * (nc - 1) / den
      val sign = num.signum.toLong
      assert(got((x.toLong, y.toLong)) ==
        ((w.toLong, l.toLong, sign, zsq.toLong)), s"cell ($x,$y)")
    }
  }
}
