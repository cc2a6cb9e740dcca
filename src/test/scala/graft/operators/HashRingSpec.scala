package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class HashRingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("hashring-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def assignments(nodes: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val keys = (0L until 500L).toDF("k")
    HashRing.assign(keys, "k", HashRing.ring(s, nodes, 16))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("every key lands on a valid node; all nodes get some keys") {
    val a = assignments(8)
    assert(a.size === 500)
    assert(a.values.forall(n => n >= 0 && n < 8))
    assert(a.values.toSet.size === 8) // 16 vnodes x 500 keys: all hit
  }

  test("consistency: adding a node only moves keys TO the new node") {
    val before = assignments(12)
    val after = assignments(13)
    val moved = before.keys.filter(k => before(k) != after(k))
    assert(moved.forall(k => after(k) == 12L),
      s"keys moved to an old node: ${moved.filter(k => after(k) != 12L)}")
    // and the new node actually captured something
    assert(moved.nonEmpty)
    // bounded churn: expected ~1/13 of keys; allow generous 3x slack
    assert(moved.size <= 500 * 3 / 13)
  }

  test("brute-force parity on a tiny ring") {
    val s = spark
    import s.implicits._
    def h32(x: Long): Long = {
      val v = (x * 2654435761L) % 4294967296L
      if (v < 0) v + 4294967296L else v
    }
    val ring = (0 until 3 * 4).map(i => (i / 4).toLong -> h32(i * 7919L + 13L))
    val keys = (0L until 100L)
    val exp = keys.map { k =>
      val kh = h32(k)
      val cand = ring.filter(_._2 >= kh)
      val pool = if (cand.nonEmpty) cand else ring
      k -> pool.minBy { case (n, vh) => vh * 65536L + n }._1
    }.toMap
    val got = HashRing.assign(keys.toDF("k"), "k", HashRing.ring(s, 3, 4))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === exp)
  }
}
