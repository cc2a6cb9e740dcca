package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** beld3smk/beld4smk merge semantics beyond the driver gates (q55/q56):
  * variable routing, the width-agnostic contract (BELD4's 276 variables),
  * and convert_beld's negative-reset rule. */
class BeldSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false").appName("beld-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("merge3 sums each variable across tiles; QA flags only bad cells") {
    import spark.implicits._
    // 2 tiles × 2 cells; v_a + v_b sums to 100 at (1,1), 97 at (2,1)
    val a = Seq((1, 1, 1, 40.0), (2, 1, 1, 30.0),
                (1, 2, 1, 50.0), (2, 2, 1, 17.0)).toDF("tile", "col", "row", "v_a")
    val b = Seq((1, 1, 1, 10.0), (2, 1, 1, 20.0),
                (1, 2, 1, 20.0), (2, 2, 1, 10.0)).toDF("tile", "col", "row", "v_b")
    val tot = Seq((1, 1, 1, 7.0), (2, 1, 1, 9.0),
                  (1, 2, 1, 3.0), (2, 2, 1, 4.0)).toDF("tile", "col", "row", "FOREST")
    val m = Beld.merge3(a, b, tot, Seq("v_a"), Seq("v_b"))
    val mergedA = m.a.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(mergedA == Map((1, 1) -> 70.0, (2, 1) -> 67.0))
    val forest = m.tot.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(forest == Map((1, 1) -> 16.0, (2, 1) -> 7.0))
    val qa = m.qa.collect()
    assert(qa.length == 1)
    assert(qa.head.getAs[Int]("col") == 2 && qa.head.getAs[Double]("pctdiff") == -3.0)
  }

  test("merge3 checks cells present in only one file; domainCells covers absent cells") {
    import spark.implicits._
    // sparse inputs (dropZeros): cell (1,1) appears only in _a with 60.0 —
    // beld3smk.c:496-509 checks every cell, so it must be flagged (total 60)
    val a = Seq((1, 1, 1, 60.0)).toDF("tile", "col", "row", "v_a")
    val b = Seq((1, 2, 1, 100.0)).toDF("tile", "col", "row", "v_b")
    val tot = Seq((1, 1, 1, 5.0)).toDF("tile", "col", "row", "FOREST")
    val m = Beld.merge3(a, b, tot, Seq("v_a"), Seq("v_b"))
    val qa = m.qa.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(qa == Map((1, 1) -> 60.0)) // b-only cell (2,1) totals 100 → clean
    // with the domain cell list, a cell in NEITHER file (3,1) is flagged at 0
    val cells = Seq((1, 1), (2, 1), (3, 1)).toDF("col", "row")
    val m2 = Beld.merge3(a, b, tot, Seq("v_a"), Seq("v_b"),
      domainCells = Some(cells))
    val qa2 = m2.qa.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(qa2 == Map((1, 1) -> 60.0, (3, 1) -> 0.0))
  }

  test("merge3 is width-agnostic: BELD4's 276 variables in one aggregation") {
    import spark.implicits._
    val varsA = (0 until 138).map(i => s"w_$i")
    val varsB = (138 until 276).map(i => s"w_$i")
    val base = spark.range(2).toDF("tile")
      .crossJoin(Seq((1, 1), (2, 1)).toDF("col", "row"))
    val wide = base.select(
      Seq(col("tile"), col("col"), col("row")) ++
        (0 until 276).map(i => lit(i * 0.5).as(s"w_$i")): _*)
    val m = Beld.merge3(wide.select((Seq("tile", "col", "row") ++ varsA).map(col): _*),
      wide.select((Seq("tile", "col", "row") ++ varsB).map(col): _*),
      wide.select(col("tile"), col("col"), col("row"), col("w_0").as("FOREST")),
      varsA, varsB)
    val row = m.a.where(col("col") === 1).collect().head
    // each var summed over 2 tiles
    assert(row.getAs[Double]("w_137") == 137 * 0.5 * 2)
    assert(m.b.columns.length == 2 + 138)
  }

  test("convertResetRule: negative numer/denom reset (convert_beld.c:140-150)") {
    import spark.implicits._
    val srg = Seq(
      ("A", 0.5, 5.0, 10.0),   // normal row: untouched
      ("B", -0.3, -3.0, 10.0), // numer < 0: frac = -numer = 3, a = b = 0
      ("C", 2.0, 4.0, -2.0)    // denom < 0: frac = -numer = -4, a = b = 0
    ).toDF("fips", "frac", "numer", "denom")
    val out = Beld.convertResetRule(srg).collect()
      .map(r => r.getString(0) -> ((r.getAs[Double]("frac"),
        r.getAs[Double]("numer"), r.getAs[Double]("denom")))).toMap
    assert(out("A") == ((0.5, 5.0, 10.0)))
    assert(out("B") == ((3.0, 0.0, 0.0)))
    assert(out("C") == ((-4.0, 0.0, 0.0)))
  }
}
