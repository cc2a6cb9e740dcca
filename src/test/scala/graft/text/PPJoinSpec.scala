package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** PPJoin+ positional filter: on an adversarial sliding-window corpus
  * (many sub-threshold pairs sharing rare prefix shingles) the positional
  * bound must prune candidates the plain prefix filter keeps, while the
  * final verified output stays EXACTLY equal to brute force. */
class PPJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false").appName("ppjoin-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // sliding windows at stride 6 over a cyclic vocabulary: adjacent docs
  // share 6 of 12 words (jac = 4/16 = 0.25 < tau) — true negatives whose
  // shared shingles still enter prefixes; plus 3 genuine near-dups
  private def corpus = {
    import spark.implicits._
    val words = (0 until 240).map(i => s"w$i")
    val slide = (0 until 200).map { i =>
      (i.toLong, (0 until 12).map(k => words((i * 6 + k) % 240)).mkString(" "))
    }
    val dups = Seq(
      (1000L, slide(10)._2),                       // exact dup of doc 10
      (1001L, slide(20)._2.replace("w126", "zz")), // near dup of doc 20
      (1002L, slide(30)._2))                       // exact dup of doc 30
    (slide ++ dups).toDF("doc_id", "text")
  }

  test("connectedComponents labels chains, cliques and singletons correctly") {
    import spark.implicits._
    // chain 1-2-3-4 (worst case: propagation distance 3), clique 10-11-12,
    // singleton 99
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 99L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
                    (10L, 11L), (10L, 12L), (11L, 12L)).toDF("id_a", "id_b")
    val got = TextOps.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
                      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("star components match propagation on random graphs and handle 300-chains") {
    import spark.implicits._
    // deterministic random graphs at three densities
    var seed = 0xfeedL
    def next(): Long = { seed = TextHash.mix64(seed); seed }
    for (nEdges <- Seq(40, 150, 400)) {
      val n = 120
      val nodes = (0L until n).toDF("id")
      val es = (1 to nEdges).map { _ =>
        (math.abs(next()) % n, math.abs(next()) % n)
      }.filter(e => e._1 != e._2)
      val pairs = es.toDF("id_a", "id_b")
      val prop = TextOps.connectedComponents(nodes, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = TextOps.connectedComponentsStar(nodes, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star.size == n, s"star emitted ${star.size} labels for $n nodes")
      assert(star == prop, s"nEdges=$nEdges: " +
        s"${star.toSeq.sorted.zip(prop.toSeq.sorted).filter(p => p._1 != p._2).take(3)}")
    }
    // a 300-node chain: propagation alone needs 299 passes (past its cap,
    // triggering the star fallback); star needs O(log n) rounds
    val chainNodes = (0L until 300L).toDF("id")
    val chainPairs = (0L until 299L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val viaFallback = TextOps.connectedComponents(chainNodes, chainPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFallback.size == 300 && viaFallback.values.forall(_ == 0L),
      "every chain node must label to the component minimum 0")
  }

  test("positional filter prunes candidates without changing the output") {
    val tau = 0.5
    val prepared = corpus.select(col("doc_id").as("id"),
        TextHash.shingleHashSetUdf(3)(col("text")).as("shs"))
      .where(size(col("shs")) > 0)
    val plain = TextOps.ngramJaccardCandidates(prepared, tau, positional = false).count()
    val pos = TextOps.ngramJaccardCandidates(prepared, tau, positional = true).count()
    assert(pos < plain, s"positional filter pruned nothing ($pos vs $plain)")

    // exact output parity vs driver-side brute force
    val engine = TextOps.ngramJaccardPairs(corpus, "doc_id", "text", 3, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = corpus.collect()
      .map(r => (r.getLong(0), TextHash.shingleHashes(r.getString(1), 3).toSet))
    val brute = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter)
      if jac >= tau
    } yield (ia, ib)).toSet
    assert(brute.nonEmpty, "fixture has no true pairs — parity check vacuous")
    assert(engine == brute,
      s"missed=${(brute -- engine).take(5)} extra=${(engine -- brute).take(5)}")
  }
}
