package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** AS-OF and range join operators: semantics on adversarial fixtures plus
  * the plan contracts that make them scale-safe (as-of: window, no join
  * node at all; range: hash equi-join, never a nested-loop cross
  * product). */
class AsOfRangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("asof-range-join-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("asOf: inclusive t' <= t, ties take the version AT t, no prior " +
       "version yields null, keys independent") {
    val s = spark
    import s.implicits._
    val left = Seq(("a", 99L, "l1"), ("a", 100L, "l2"), ("a", 250L, "l3"),
      ("b", 50L, "l4"), ("b", 500L, "l5"), ("c", 10L, "l6"))
      .toDF("k", "t", "tag")
    val right = Seq(("a", 100L, 1L), ("a", 200L, 2L), ("b", 500L, 9L))
      .toDF("k", "vt", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "vt", Seq("v"))
    val got = out.collect()
      .map(r => r.getAs[String]("tag") ->
        Option(r.getAs[Any]("v")).map(_.asInstanceOf[Long])).toMap
    assert(got == Map("l1" -> None, "l2" -> Some(1L), "l3" -> Some(2L),
      "l4" -> None, "l5" -> Some(9L), "l6" -> None))
    // every left column survives untouched
    assert(out.columns.toSeq == Seq("k", "t", "tag", "v"))
    // plan: a union + ONE keyed window — no join operator anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("asOf: a right row with a null payload FIELD still supersedes " +
       "older versions (struct-level last, not field-level)") {
    val s = spark
    import s.implicits._
    val left = Seq(("a", 300L)).toDF("k", "t")
    val right = Seq(("a", 100L, Some(7L)), ("a", 200L, None))
      .toDF("k", "vt", "v")
    val got = AsOfJoin.asOf(left, right, "k", "t", "vt", Seq("v"))
      .collect().head
    assert(got.isNullAt(got.fieldIndex("v")),
      "the t=200 null-field version must win over t=100")
  }

  test("pointInRange: closed bounds, bucket-crossing ranges, overlaps " +
       "multiply, no-match points keep one null row") {
    val s = spark
    import s.implicits._
    // bucketWidth 100; ranges: [95, 205] crosses three buckets,
    // [200, 210] overlaps it, [400, 400] is a degenerate point range
    val ranges = Seq((95L, 205L, "r1"), (200L, 210L, "r2"),
      (400L, 400L, "r3")).toDF("lo", "hi", "name")
    val pts = Seq(1L, 95L, 150L, 200L, 205L, 206L, 400L, 999L).toDF("p")
    val out = RangeJoin.pointInRange(pts, ranges, "p", "lo", "hi",
      Seq("name"), bucketWidth = 100L)
    val got = out.collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(1L) == Set(None))
    assert(got(95L) == Set(Some("r1")))
    assert(got(150L) == Set(Some("r1")))
    assert(got(200L) == Set(Some("r1"), Some("r2"))) // overlap → 2 rows
    assert(got(205L) == Set(Some("r1"), Some("r2")))
    assert(got(206L) == Set(Some("r2")))
    assert(got(400L) == Set(Some("r3")))
    assert(got(999L) == Set(None))
    // plan: hash equi-join on the bucket, never a nested-loop product
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join degenerated to a cross product:\n$plan")
  }

  test("bfs: chain depths, cycle safety, multi-seed minimum, depth cap, " +
       "unreachable nodes absent") {
    val s = spark
    import s.implicits._
    import graft.graph.Bfs
    // 0→1→2→3→4→0 (cycle) plus 9→3 shortcut and isolated 7→8
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L),
      (9L, 3L), (7L, 8L)).toDF("src", "dst")
    val seeds = Seq(0L, 9L).toDF("id")
    val got = Bfs.depths(edges, seeds, maxDepth = 10).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 3 is 1 hop from seed 9, not 3 hops from seed 0
    assert(got == Map(0L -> 0, 9L -> 0, 1L -> 1, 3L -> 1, 2L -> 2,
      4L -> 2))
    // cap: depth 1 stops the frontier after one expansion
    val capped = Bfs.depths(edges, Seq(0L).toDF("id"), maxDepth = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped == Map(0L -> 0, 1L -> 1))
  }

  test("quantize int8: exact values, zero-vector guard, integer-dot " +
       "top-k matches brute force") {
    val s = spark
    import s.implicits._
    import graft.ml.Quantize
    val vecs = Seq(
      (0L, Array(1.0f, -0.5f, 0.25f)),
      (1L, Array(0.0f, 0.0f, 0.0f)),
      (2L, Array(-2.0f, 1.0f, 4.0f)),
      (3L, Array(1.0f, 1.0f, 1.0f))).toDF("id", "vec")
    val q = Quantize.int8(vecs, "id", "vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(q(0L) == Seq(127, -63, 32)) // -63.5+0.5 floor, 31.75+0.5 floor
    assert(q(1L) == Seq(0, 0, 0))
    assert(q(2L) == Seq(-63, 32, 127))
    assert(q(3L) == Seq(127, 127, 127))
    val top = Quantize.topKDotQuantized(vecs, "id", "vec", Seq(0L), k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // brute force: dot(q0, q1)=0, dot(q0, q2)=-63*127+32*(-63)+127*32=-5953
    //              dot(q0, q3)=127*127-63*127+32*127=12192
    assert(top.toSeq == Seq((1, 3L, 12192L), (2, 1L, 0L), (3, 2L, -5953L)))
  }
}
