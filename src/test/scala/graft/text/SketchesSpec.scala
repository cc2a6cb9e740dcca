package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("sketches-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("CMS estimates dominate exact counts and are partition-invariant") {
    val s = spark
    import s.implicits._
    val counts = (1 to 300).map(i => (s"tok$i", (i % 17 + 1).toLong))
      .toDF("w", "c")
    def run(parts: Int) = {
      val sk = CountMin.sketch(counts.repartition(parts), "w", "c", 256)
      CountMin.estimate(sk, counts, "w", 256)
        .join(counts, "w")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    }
    val base = run(1)
    base.foreach { case (w, (est, exact)) =>
      assert(est >= exact, s"$w: CMS underestimated ($est < $exact)")
    }
    assert(run(5) == base, "sketch must not depend on partitioning")
  }

  test("rho32 ladder matches Integer.numberOfLeadingZeros") {
    val s = spark
    import s.implicits._
    val vs = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L,
      (1L << 31) - 1, 1L << 31, (1L << 32) - 1)
    val got = vs.toDF("v")
      .select(col("v"), HyperLogLog.rho32(col("v")).as("rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vs.foreach { v =>
      val want =
        if (v == 0) 33
        else java.lang.Integer.numberOfLeadingZeros(v.toInt) + 1
      assert(got(v) == want, s"v=$v")
    }
  }

  test("HLL estimate is partition-invariant and within 25% at n=2000") {
    val s = spark
    import s.implicits._
    val rows = (1 to 2000).map(i => ("g", s"item$i")) ++
      (1 to 50).map(i => ("h", s"thing$i"))
    def run(parts: Int) =
      HyperLogLog.estimateDistinct(rows.toDF("g", "w").repartition(parts),
          "g", "w")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = run(1)
    assert(run(7) == base, "estimate must not depend on partitioning")
    assert(math.abs(base("g") - 2000L) <= 500, s"g: ${base("g")}")
    assert(math.abs(base("h") - 50L) <= 15, s"h: ${base("h")}")
  }

  test("histogram quantile sketch: exact <= est < exact + binWidth, " +
      "partition-invariant, for n in 1..400 x p in {50,90,99}") {
    val s = spark
    import s.implicits._
    val ps = Seq(50, 90, 99)
    // skewed deterministic values across several group sizes, incl. n=1
    val rows = for {
      (g, n) <- Seq(("a", 1), ("b", 7), ("c", 64), ("d", 400))
      i <- 0 until n
    } yield (g, (i * i * 37L) % 5000, s"$g$i")
    val df = rows.toDF("g", "v", "id")
    for (w <- Seq(1L, 16L, 64L)) {
      val est = HistQuantile.quantiles(df, "g", "v", w, ps)
        .collect().map(r => r.getString(0) ->
          ps.indices.map(i => r.getLong(2 + i))).toMap
      val exact = PipelineOps.exactPercentiles(df, "g", "v", "id", ps)
        .collect().map(r => r.getString(0) ->
          ps.indices.map(i => r.getLong(2 + i))).toMap
      for ((g, ex) <- exact; i <- ps.indices) {
        assert(est(g)(i) >= ex(i) && est(g)(i) < ex(i) + w,
          s"g=$g p=${ps(i)} w=$w: est=${est(g)(i)} exact=${ex(i)}")
      }
      val est5 = HistQuantile.quantiles(df.repartition(5), "g", "v", w, ps)
        .collect().map(r => r.getString(0) ->
          ps.indices.map(i => r.getLong(2 + i))).toMap
      assert(est5 == est, s"w=$w: sketch must not depend on partitioning")
    }
  }
}
