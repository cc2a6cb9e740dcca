package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SkylineTopologySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("skyline-topology-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def bruteSkyline(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { case (_, s1, s2) =>
      !pts.exists { case (_, t1, t2) =>
        t1 >= s1 && t2 >= s2 && (t1 > s1 || t2 > s2)
      }
    }.map(_._1).toSet

  test("skyline matches brute force, keeps exact ties, salt-invariant") {
    val s = spark
    import s.implicits._
    // deterministic cloud with planted exact ties on the frontier
    val pts = (0L until 300L).map(i =>
      (i, (i * 7919) % 97, (i * 104729) % 89)) ++
      Seq((1000L, 96L, 88L), (1001L, 96L, 88L)) // tied corner pair
    val df = pts.toDF("doc_id", "a", "b")
    for (salts <- Seq(1, 8, 64)) {
      val got = Skyline.skyline2(df, "doc_id", "a", "b", salts)
        .collect().map(_.getLong(0)).toSet
      assert(got == bruteSkyline(pts), s"salts=$salts")
    }
    assert(bruteSkyline(pts).contains(1000L) &&
      bruteSkyline(pts).contains(1001L), "ties must both survive")
  }

  test("edge adjacency pairs squares sharing a full edge, not a corner") {
    val s = spark
    import s.implicits._
    def sq(x0: Double, y0: Double, side: Double) =
      Seq(Seq(x0, y0, x0 + side, y0, x0 + side, y0 + side, x0, y0 + side))
    // A-B share an edge; A-C touch only at a corner; D is disjoint;
    // E shares an edge with B but is listed with reversed ring direction
    val polys = Seq(
      ("A", sq(0, 0, 10)), ("B", sq(10, 0, 10)), ("C", sq(10, 10, 10)),
      ("D", sq(40, 40, 10)),
      ("E", Seq(Seq(30.0, 0, 30, 10, 20, 10, 20, 0))) // reversed orientation
    ).toDF("id", "geom")
    val adj = Topology.edgeAdjacency(polys, "id", "geom")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // A-C touch only at the corner (10,10) and must NOT pair; B-C share
    // the y=10 edge, B-E the x=20 edge (E's ring runs reversed)
    assert(adj == Set(("A", "B"), ("B", "C"), ("B", "E")), s"got $adj")
  }

  test("adjacency counts multiple shared edges") {
    val s = spark
    import s.implicits._
    // a 3x1 bar whose top side is split at the comb's vertices (edge
    // keys match only on identical segmentation — coverage semantics),
    // sharing the two outer unit edges with the comb but not the notch
    val bar = Seq(Seq(0.0, 0, 3, 0, 3, 1, 2, 1, 1, 1, 0, 1))
    val comb = Seq(Seq(0.0, 1, 1, 1, 1, 2, 2, 2, 2, 1, 3, 1, 3, 2, 0, 2))
    val polys = Seq(("bar", bar), ("comb", comb)).toDF("id", "geom")
    val adj = Topology.edgeAdjacency(polys, "id", "geom")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(adj.toSeq == Seq(("bar", "comb", 2L)), s"got ${adj.toSeq}")
  }
}
