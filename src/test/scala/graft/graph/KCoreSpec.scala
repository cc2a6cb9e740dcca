package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class KCoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("kcore-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Single-threaded peel reference. */
  private def ref(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    var changed = true
    while (changed) {
      val deg = e.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
      val keep = deg.filter(_._2 >= k).keySet
      val e2 = e.filter { case (a, b) => keep(a) && keep(b) }
      changed = e2.size != e.size
      e = e2
    }
    e.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
  }

  private def run(edges: Seq[(Long, Long)], k: Int, parts: Int = 4): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    KCore.core(edges.toDF("src", "dst").repartition(parts), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4 plus a pendant path: 3-core is exactly the K4") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val g = k4 ++ Seq((3L, 4L), (4L, 5L), (5L, 6L))
    assert(run(g, 3) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("cascading peel: removing one leaf unravels the whole chain") {
    // a path graph has empty 2-core — every round exposes a new endpoint
    val path = (0L until 8L).map(i => (i, i + 1))
    assert(run(path, 2).isEmpty)
    // a cycle IS its own 2-core
    val cycle = path :+ (8L, 0L)
    assert(run(cycle, 2) === (0L to 8L).map(_ -> 2L).toMap)
  }

  test("matches the reference peel on a seeded random graph, dup/direction safe") {
    val rnd = new scala.util.Random(99)
    val base = (1 to 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val noisy = base ++ base.map(_.swap) ++ Seq((5L, 5L))
    for (k <- Seq(2, 3, 4))
      assert(run(noisy, k) === ref(base, k), s"k=$k")
  }

  test("partition-count invariant") {
    val rnd = new scala.util.Random(3)
    val g = (1 to 250).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    assert(run(g, 3, parts = 1) === run(g, 3, parts = 8))
  }
}
