package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SsspSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("sssp-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Reference: Bellman-Ford in plain Scala capped at maxRounds edges. */
  private def refDistances(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                           maxRounds: Int): Map[Long, Long] = {
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 0 until maxRounds) {
      val upd = edges.flatMap { case (s, d, w) =>
        dist.get(s).map(ds => d -> (ds + w))
      }
      dist = (dist.toSeq ++ upd).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    dist
  }

  private def deterministicGraph(n: Int): Seq[(Long, Long, Long)] =
    (0 until 3 * n).map { i =>
      val s = (i * 7919L) % n
      val d = (i * 104729L + 13) % n
      (s, d, (s * 7 + d * 13) % 9 + 1)
    }.distinct

  test("matches the reference Bellman-Ford on a deterministic graph") {
    val s = spark
    import s.implicits._
    val edges = deterministicGraph(60)
    val edf = edges.toDF("src", "dst", "w")
    val seeds = Seq(0L, 7L).toDF("id")
    for (rounds <- Seq(0, 1, 3, 10)) {
      val got = Sssp.distances(edf, seeds, rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refDistances(edges, Seq(0L, 7L), rounds), s"rounds=$rounds")
    }
  }

  test("converged result is invariant to extra rounds and partitioning") {
    val s = spark
    import s.implicits._
    val edges = deterministicGraph(40)
    val seeds = Seq(0L).toDF("id")
    val base = Sssp.distances(edges.toDF("src", "dst", "w"), seeds, 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val more = Sssp.distances(edges.toDF("src", "dst", "w").repartition(7),
        seeds, 200)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base == more)
  }

  test("weighted shortcut beats the hop-shortest path") {
    val s = spark
    import s.implicits._
    // 0 -10-> 2 direct, but 0 -1-> 1 -1-> 2 is cheaper despite more hops
    val edges = Seq((0L, 2L, 10L), (0L, 1L, 1L), (1L, 2L, 1L))
      .toDF("src", "dst", "w")
    val got = Sssp.distances(edges, Seq(0L).toDF("id"), 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    // with a single round only the direct edge is reachable at cost 10
    val one = Sssp.distances(edges, Seq(0L).toDF("id"), 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(0L -> 0L, 1L -> 1L, 2L -> 10L))
  }
}
