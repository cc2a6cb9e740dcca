package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Property gates for the integer-exact statistics operators: percentile
  * rank arithmetic vs a brute-force sort across every group size, and the
  * soft-dedup hash gate's keep-rate band across every duplicate-group
  * size — so fixture growth can never silently drift either one. */
class StatsPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("stats-property-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("exactPercentiles matches a brute-force sort for every group size " +
       "1..300 (+997, 1000) at p in {50, 90, 99}, with heavy ties") {
    val s = spark
    import s.implicits._
    val sizes = (1 to 300) ++ Seq(997, 1000)
    // values carry many ties ((g*31 + i*17) mod 97) so the rank pick is
    // exercised inside runs of equal values, where off-by-one hides best
    val rows = sizes.flatMap(n =>
      (0 until n).map(i => (n.toLong, (n * 31 + i * 17) % 97L,
        s"id-$n-$i")))
    val df = rows.toDF("g", "v", "id").repartition(8)
    val ps = Seq(50, 90, 99)
    val got = PipelineOps.exactPercentiles(df, "g", "v", "id", ps)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_rows"), ps.map(p => r.getAs[Long](s"p$p")))))
      .toMap
    sizes.foreach { n =>
      val sorted = (0 until n).map(i => (n * 31 + i * 17) % 97L).sorted
      val (gotN, gotPs) = got(n.toLong)
      assert(gotN == n.toLong)
      ps.zip(gotPs).foreach { case (p, gv) =>
        val rank = (n.toLong * p + 99) / 100 // ceil(n*p/100), 1-based
        assert(rank >= 1 && rank <= n, s"rank $rank out of range for n=$n")
        assert(gv == sorted((rank - 1).toInt),
          s"n=$n p=$p: got $gv want ${sorted((rank - 1).toInt)}")
      }
    }
  }

  test("softDedupWeights keep rate: every dup-group size 2..200 keeps at " +
       "most a small constant, mean ~1 survivor per group, uniques always " +
       "survive, decisions partition-invariant") {
    val s = spark
    import s.implicits._
    // group n = n byte-identical copies with consecutive ids; the gate's
    // residue (id*131+7) mod 1000 walks an arithmetic progression, so the
    // kept count per group is a deterministic function this property pins
    val rows = (2 to 200).flatMap(n =>
      (0 until n).map(i => (n * 1000L + i, s"dup text $n"))) ++
      (1 to 50).map(i => (900000L + i, s"unique $i"))
    val df = rows.toDF("id", "text")
    val out = PipelineOps.softDedupWeights(df, "id", "text")
    val byGroup = out.where(col("n_dups") > 1)
      .groupBy("n_dups").agg(sum("keep").as("kept"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (2 to 200).foreach { n =>
      val kept = byGroup(n.toLong)
      assert(kept <= 4,
        s"group of $n kept $kept copies — hash gate drifted from ~1")
    }
    val mean = byGroup.values.sum.toDouble / byGroup.size
    assert(mean >= 0.5 && mean <= 1.5,
      s"mean survivors per dup group $mean outside [0.5, 1.5]")
    // uniques: milli = 1000 → unconditional keep
    assert(out.where(col("n_dups") === 1 && col("keep") =!= 1).count() == 0)
    // determinism: same decisions under a different partitioning
    val again = PipelineOps.softDedupWeights(df.repartition(13), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    out.collect().foreach(r =>
      assert(again(r.getLong(0)) == r.getInt(3), s"id ${r.getLong(0)}"))
  }
}
