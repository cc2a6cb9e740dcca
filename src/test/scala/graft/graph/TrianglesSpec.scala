package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class TrianglesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("triangles-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Brute-force reference: per-node triangle membership by triple scan. */
  private def ref(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if und((a, b)) && und((b, c)) && und((a, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  private def run(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val out = Triangles.perNode(edges.toDF("src", "dst").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.spark.PersistTracker.drain()
    out
  }

  test("K4: every node is in 3 triangles") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(run(k4) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangle-free graph (star + path) yields no rows") {
    val g = Seq((0L, 1L), (0L, 2L), (0L, 3L), (3L, 4L), (4L, 5L))
    assert(run(g).isEmpty)
  }

  test("matches brute force on a seeded random graph; direction/dup/self-loop safe") {
    val rnd = new scala.util.Random(42)
    val base = (1 to 300).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    // feed the operator reversed duplicates and self-loops on top
    val noisy = base ++ base.map(_.swap) ++ Seq((7L, 7L), (3L, 3L))
    assert(run(noisy) === ref(base))
  }

  test("output is partition-count invariant") {
    val rnd = new scala.util.Random(7)
    val g = (1 to 200).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    assert(run(g, parts = 1) === run(g, parts = 8))
  }

  test("clusteringCoeff matches brute force (deg, tri, exact micro-units)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val g = (1 to 250).map(_ => (rnd.nextInt(28).toLong, rnd.nextInt(28).toLong))
    val got = Triangles.clusteringCoeff(g.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    graft.spark.PersistTracker.drain()
    val und = g.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val deg = und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tri = ref(g).withDefaultValue(0L)
    assert(got.keySet === deg.keySet)
    deg.foreach { case (id, d) =>
      val (gd, gt, gc) = got(id)
      assert(gd === d, s"deg of $id")
      assert(gt === tri(id), s"tri of $id")
      val expCc = if (d >= 2) 2000000L * tri(id) / (d * (d - 1)) else 0L
      assert(gc === expCc, s"cc of $id")
    }
  }
}
