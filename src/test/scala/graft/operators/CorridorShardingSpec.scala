package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.grid.GridSpec

class CorridorShardingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("corridor-sharding-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val g = GridSpec("T4", 0, 0, 100.0, 100.0, 10, 10)

  test("corridor matches the brute-force segments × all-cells scan") {
    val s = spark
    import s.implicits._
    val segs = Seq((1L, 120.0, 450.0, 230.0), (2L, 0.0, 80.0, 995.0),
      (3L, 500.0, 505.0, 500.0), (4L, 880.0, 1300.0, 40.0))
      .toDF("id", "x1", "x2", "y")
    val r = 140.0
    val got = Corridor.cellsNear(segs, g, r)
      .collect().map(x => (x.getInt(0), x.getInt(1)) ->
        (x.getLong(2), x.getLong(3))).toMap
    val brute = for {
      c <- 1 to 10; w <- 1 to 10
      cx = (c - 0.5) * 100; cy = (w - 0.5) * 100
      ds = Seq((120.0, 450.0, 230.0), (0.0, 80.0, 995.0),
        (500.0, 505.0, 500.0), (880.0, 1300.0, 40.0)).map { case (x1, x2, y) =>
        val dx = math.max(0.0, math.max(x1 - cx, cx - x2))
        dx * dx + (cy - y) * (cy - y)
      }.filter(_ <= r * r)
      if ds.nonEmpty
    } yield (c, w) -> (ds.length.toLong, ds.min.toLong)
    assert(got == brute.toMap)
  }

  test("snapPoints matches the brute-force nearest segment within r") {
    val s = spark
    import s.implicits._
    val pts = Seq((1L, 150.0, 210.0), (2L, 990.0, 980.0), (3L, 40.0, 700.0),
      (4L, 555.0, 555.0), (5L, 5.0, 5.0))
    val segs = Seq((10L, 100.0, 400.0, 230.0), (11L, 0.0, 80.0, 680.0),
      (12L, 900.0, 1300.0, 940.0), (13L, 100.0, 400.0, 190.0))
    val got = Corridor.snapPoints(pts.toDF("pid", "x", "y"),
        segs.toDF("id", "x1", "x2", "sy"), bucket = 250.0, r = 120.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val brute = pts.flatMap { case (pid, x, y) =>
      val cand = segs.map { case (id, x1, x2, sy) =>
        val dx = math.max(0.0, math.max(x1 - x, x - x2))
        (id, dx * dx + (y - sy) * (y - sy))
      }.filter(_._2 <= 120.0 * 120.0)
      if (cand.isEmpty) None
      else {
        val m = cand.minBy { case (id, d2) => (d2, id) }
        Some(pid -> (m._1, m._2.toLong))
      }
    }.toMap
    assert(got == brute, s"got $got exp $brute")
    assert(!got.contains(4L), "a point with nothing in range must emit nothing")
  }

  test("hrw resharding 16 -> 17 moves a small stable fraction, exactly once per key") {
    val s = spark
    import s.implicits._
    val keys = (0L until 2000L).toDF("k")
    val a = keys.withColumn("s16", Sharding.hrwShard("k", 16))
      .withColumn("s17", Sharding.hrwShard("k", 17))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.forall { case (_, s16, s17) => s16 >= 0 && s16 < 16 && s17 >= 0 && s17 < 17 })
    val moved = a.count { case (_, s16, s17) => s16 != s17 }
    // expectation 2000/17 ≈ 118; a mod-N scheme would move ~1882
    assert(moved > 40 && moved < 300, s"moved=$moved — not HRW-stable")
    // movers must land on the NEW shard only (that's the HRW guarantee)
    assert(a.forall { case (_, s16, s17) => s16 == s17 || s17 == 16 },
      "a mover's new assignment must be the added shard")
    // deterministic across partitioning
    val b = keys.repartition(7).withColumn("s16", Sharding.hrwShard("k", 16))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.forall { case (k, s16, _) => b(k) == s16 })
  }

  test("overlay semi + anti partition the points exactly") {
    val s = spark
    import s.implicits._
    import graft.fixtures.TpchGeo.{domain, zres}
    val pts = (1L to 500L)
      .map(i => (i, ((i * 137) % 1000).toDouble + 0.5, ((i * 241) % 1000).toDouble + 0.5))
      .toDF("id", "x", "y")
    val mask = Seq(Seq(Seq(100.0, 100, 400, 100, 400, 400, 100, 400)))
      .toDF("geom")
    val inside = SpatialJoin.overlayPoints(pts, mask, domain, zres)
      .select("id").collect().map(_.getLong(0)).toSet
    val outside = SpatialJoin.overlayPointsAnti(pts, mask, domain, zres)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(inside.intersect(outside).isEmpty)
    assert(inside.union(outside) == (1L to 500L).toSet)
    assert(inside.nonEmpty && outside.nonEmpty)
  }
}
