package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class LabelPropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("labelprop-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Plain-Scala synchronous LPA with the (count DESC, label ASC) vote. */
  private def refPropagate(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
    val sym = (und ++ und.map(e => (e._2, e._1))).distinct
    val adj = sym.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var lab = adj.keys.map(k => k -> k).toMap
    for (_ <- 0 until rounds) {
      lab = adj.map { case (v, ns) =>
        val votes = ns.map(lab).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  private def deterministicGraph(n: Int): Seq[(Long, Long)] =
    (0 until 3 * n).map { i =>
      ((i * 7919L) % n, (i * 104729L + 13) % n)
    }.distinct

  test("matches the reference synchronous LPA round for round") {
    val s = spark
    import s.implicits._
    val edges = deterministicGraph(50)
    val edf = edges.toDF("src", "dst")
    for (rounds <- Seq(0, 1, 2, 4)) {
      val got = LabelProp.propagate(edf, rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refPropagate(edges, rounds), s"rounds=$rounds")
    }
  }

  test("two disjoint cliques settle to one label each; bridges stay split") {
    val s = spark
    import s.implicits._
    val cliqueA = for (i <- 0L until 6L; j <- 0L until 6L if i < j) yield (i, j)
    val cliqueB = cliqueA.map { case (a, b) => (a + 10L, b + 10L) }
    val edges = (cliqueA ++ cliqueB :+ (5L, 10L)).toDF("src", "dst")
    val labs = LabelProp.propagate(edges, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs.filter(_._1 < 10L).values.toSet == Set(0L),
      "clique A must settle to its min node label")
    assert(labs.filter(_._1 >= 10L).values.toSet.size == 1,
      "clique B must settle to one label")
    assert(labs(0L) != labs(12L),
      "a single bridge edge must not merge two 6-cliques")
  }

  test("labels are always node ids of the same connected component") {
    val s = spark
    import s.implicits._
    val edges = deterministicGraph(40)
    val labs = LabelProp.propagate(edges.toDF("src", "dst"), 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    assert(labs.forall { case (_, l) => nodes.contains(l) })
  }
}
