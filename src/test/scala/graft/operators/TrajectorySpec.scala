package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Brute-force parity for the trajectory layer (stay points, co-located
  * Hausdorff) and the semivariogram — naive sequential/pairwise
  * references vs the window/join operators. */
class TrajectorySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("trajectory-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // (uid, t, x, y): user 1 — a 3-point stay, a big jump, a 2-point stay
  // that FAILS the duration gate; user 2 — a long stay with one
  // over-the-time-gap hop inside it (splits); user 3 — singleton.
  private val rows = Seq(
    (1L, 0L, 100L, 100L), (1L, 40L, 110L, 105L), (1L, 90L, 95L, 102L),
    (1L, 120L, 900L, 900L), (1L, 140L, 905L, 903L),
    (2L, 0L, 50L, 50L), (2L, 60L, 55L, 48L),
    (2L, 400L, 60L, 52L), (2L, 460L, 58L, 51L), // gap 340 > 200 splits
    (3L, 10L, 0L, 0L))
  private val distSqMax = 400L // hop gate: 20 units
  private val gapMax = 200L
  private val minDur = 80L

  /** Naive sequential segmentation. */
  private def bruteStays(): Set[(Long, Long, Long, Long, Long, Long)] = {
    val out = scala.collection.mutable.Set
      .empty[(Long, Long, Long, Long, Long, Long)]
    rows.groupBy(_._1).foreach { case (uid, rs) =>
      val ord = rs.sortBy(r => (r._2, r._3, r._4))
      var seg = List.empty[(Long, Long, Long)] // (t, x, y)
      def flush(): Unit = if (seg.size >= 2) {
        val ts = seg.map(_._1); val dur = ts.max - ts.min
        if (dur >= minDur)
          out += ((uid, ts.min, ts.max, seg.size.toLong,
            seg.map(_._2).sum / seg.size, seg.map(_._3).sum / seg.size))
      }
      ord.foreach { case (_, t, x, y) =>
        seg.lastOption match {
          case Some((pt, px, py))
              if (x - px) * (x - px) + (y - py) * (y - py) <= distSqMax &&
                t - pt <= gapMax =>
            seg = seg :+ ((t, x, y))
          case _ => flush(); seg = List((t, x, y))
        }
      }
      flush()
    }
    out.toSet
  }

  test("stayPoints matches the naive sequential segmentation") {
    val s = spark
    import s.implicits._
    val df = rows.toDF("user_id", "tus", "x", "y").repartition(4)
    val got = Trajectory.stayPoints(df, "user_id", "x", "y", "tus",
        distSqMax, gapMax, minDur)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == bruteStays())
    // the fixture exercises all three gates
    assert(got.exists(_._1 == 1L), "user 1 long stay detected")
    assert(got.count(_._1 == 1L) == 1, "short-duration stay rejected")
    assert(got.count(_._1 == 2L) == 0 || got.count(_._1 == 2L) == 2,
      "user 2 split consistent")
  }

  test("hausdorffCells matches brute max-min over co-located pairs") {
    val s = spark
    import s.implicits._
    val sets = Map(
      1L -> Set((0L, 0L), (1L, 0L), (5L, 5L)),
      2L -> Set((0L, 0L), (9L, 9L)),
      3L -> Set((5L, 5L), (5L, 6L)),
      4L -> Set((100L, 100L))) // co-located with nobody
    val df = sets.toSeq.flatMap { case (u, cs) =>
      cs.toSeq.map(c => (u, c._1, c._2)) }.toDF("uid", "cx", "cy")
    val got = Trajectory.hausdorffCells(df)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    graft.spark.PersistTracker.drain()
    def cheb(a: (Long, Long), b: (Long, Long)) =
      math.max(math.abs(a._1 - b._1), math.abs(a._2 - b._2))
    def h(a: Set[(Long, Long)], b: Set[(Long, Long)]) =
      a.map(p => b.map(q => cheb(p, q)).min).max
    val want = (for {
      ua <- sets.keys; ub <- sets.keys
      if ua < ub && sets(ua).intersect(sets(ub)).nonEmpty
    } yield (ua, ub) ->
      math.max(h(sets(ua), sets(ub)), h(sets(ub), sets(ua)))).toMap
    assert(got == want)
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "non-co-located user never paired")
  }

  test("variogram matches brute pair enumeration per squared lag") {
    val s = spark
    import s.implicits._
    val n = 5
    val counts = Map((0, 0) -> 4L, (1, 0) -> 1L, (3, 2) -> 7L,
      (4, 4) -> 2L, (2, 2) -> 2L)
    def z(x: Int, y: Int) = counts.getOrElse((x, y), 0L)
    val pts = counts.toSeq.flatMap { case ((x, y), c) =>
      Seq.fill(c.toInt)((x.toLong, y.toLong)) }.toDF("cx", "cy")
    val maxLag = 8
    val got = graft.cells.Variogram.ofCounts(pts, "cx", "cy", n, n, maxLag)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    graft.spark.PersistTracker.drain()
    val acc = scala.collection.mutable.Map
      .empty[Long, (Long, Long)].withDefaultValue((0L, 0L))
    for {
      x <- 0 until n; y <- 0 until n
      dx <- -2 to 2; dy <- -2 to 2
      d2 = dx * dx + dy * dy if d2 > 0 && d2 <= maxLag
      nx = x + dx; ny = y + dy
      if nx >= 0 && ny >= 0 && nx < n && ny < n
    } {
      val (c, ss) = acc(d2.toLong)
      val dd = z(x, y) - z(nx, ny)
      acc(d2.toLong) = (c + 1, ss + dd * dd)
    }
    val want = acc.toMap.map { case (d2, (c, ss)) =>
      d2 -> ((c, ss, 1000000L * ss / (2 * c))) }
    assert(got == want)
  }
}
