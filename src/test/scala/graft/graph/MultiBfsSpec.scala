package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MultiBfsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("multibfs-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Reference: per-source BFS distances, then N(t) = |{(s,v): d <= t}|. */
  private def ref(edges: Seq[(Long, Long)], sources: Seq[Long]): Seq[(Long, Long)] = {
    val adj = edges.filter(e => e._1 != e._2).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dists = sources.flatMap { s =>
      val d = scala.collection.mutable.Map(s -> 0)
      val q = scala.collection.mutable.Queue(s)
      while (q.nonEmpty) {
        val u = q.dequeue()
        adj.getOrElse(u, Nil).foreach { v =>
          if (!d.contains(v)) { d(v) = d(u) + 1; q.enqueue(v) }
        }
      }
      d.map { case (v, dd) => (s, v, dd) }
    }
    val maxD = dists.map(_._3).max
    (0 to maxD).map(t => (t.toLong, dists.count(_._3 <= t).toLong))
  }

  private def run(edges: Seq[(Long, Long)], src: Seq[Long]): Seq[(Long, Long)] = {
    val s = spark
    import s.implicits._
    MultiBfs.neighborhoodFunction(edges.toDF("src", "dst"), src)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  test("path graph: counts grow one hop per round and stop at the end") {
    val path = (0L until 6L).sliding(2).map(p => (p(0), p(1))).toSeq
    assert(run(path, Seq(0L)) === ref(path, Seq(0L)))
  }

  test("matches per-source BFS on seeded random digraphs, multi-landmark") {
    for (seed <- Seq(2, 29)) {
      val rnd = new scala.util.Random(seed)
      val g = (1 to 80).map(_ =>
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter(e => e._1 != e._2)
      val srcs = g.map(_._1).distinct.sorted.take(10)
      assert(run(g, srcs) === ref(g, srcs), s"seed=$seed")
    }
  }

  test("rejects more than 64 landmarks") {
    val s = spark
    import s.implicits._
    val e = Seq((0L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      MultiBfs.neighborhoodFunction(e, (0L to 64L))
    }
  }
}
