package graft.ml

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class CoresetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("coreset-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Brute-force greedy on the quantized integers. */
  private def ref(vs: Map[Long, Array[Int]], k: Int): Seq[(Int, Long, Long)] = {
    def d2(a: Array[Int], b: Array[Int]): Long =
      a.zip(b).map { case (x, y) => (x - y).toLong * (x - y) }.sum
    val seed = vs.keys.min
    var picks = List((seed, 0L))
    var md = vs.map { case (id, v) => id -> d2(v, vs(seed)) }
    for (_ <- 1 until k) {
      val cand = md.filter(p => !picks.exists(_._1 == p._1))
      val (id, d) = cand.toSeq.sortBy(p => (-p._2, p._1)).head
      picks ::= (id, d)
      md = md.map { case (i, m) => i -> math.min(m, d2(vs(i), vs(id))) }
    }
    picks.reverse.zipWithIndex.map { case ((id, d), i) => (i, id, d) }
  }

  test("greedy trace matches brute force; first pick is the farthest point") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val data = (0L until 40L).map { id =>
      (id, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    val df = data.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val got = Coreset.kCenterGreedy(df, "vec_id", "embedding", 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    // re-quantize the same way for the reference
    val qs = data.map { case (id, v) =>
      val m = math.max(1e-30, v.map(x => math.abs(x.toDouble)).max)
      id -> v.map(x => math.floor(x.toDouble * 127.0 / m + 0.5).toInt)
    }.toMap
    assert(got === ref(qs, 5))
    // greedy invariant: pick distances are non-increasing after the seed
    val ds = got.drop(1).map(_._3)
    assert(ds === ds.sorted.reverse)
  }
}
