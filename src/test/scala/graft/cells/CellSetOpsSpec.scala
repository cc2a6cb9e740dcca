package graft.cells

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class CellSetOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("cellset-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def cell(res: Int, morton: Long): Long = (res.toLong << 58) | morton

  private def compactSet(cells: Seq[Long]): Set[Long] = {
    val s = spark
    import s.implicits._
    CellSetOps.compactCells(cells.toDF("cell"), "cell")
      .collect().map(_.getLong(0)).toSet
  }

  test("one full quad merges, a partial quad does not") {
    // res-2 mortons 0..3 are the children of res-1 morton 0; 4..6 is a
    // partial quad (missing 7)
    val in = (0L to 6L).map(cell(2, _))
    assert(compactSet(in) ===
      Set(cell(1, 0), cell(2, 4), cell(2, 5), cell(2, 6)))
  }

  test("recursive collapse: a fully covered region climbs to res 0") {
    val in = (0L until 16L).map(cell(2, _))
    assert(compactSet(in) === Set(cell(0, 0)))
  }

  test("mixed resolutions in the input participate at their own level") {
    // three res-2 children + the sibling already expressed at res 2 via
    // input at that res; plus an unrelated res-1 cell that must pass
    // through and then merge with the promoted parent's siblings
    val in = Seq(cell(2, 0), cell(2, 1), cell(2, 2), cell(2, 3), // → (1,0)
      cell(1, 1), cell(1, 2), cell(1, 3)) // with (1,0) → (0,0)
    assert(compactSet(in) === Set(cell(0, 0)))
  }

  test("idempotent and duplicate-safe") {
    val in = Seq(cell(2, 0), cell(2, 0), cell(2, 5))
    assert(compactSet(in) === Set(cell(2, 0), cell(2, 5)))
    assert(compactSet(compactSet(in).toSeq) === compactSet(in))
  }

  test("uncompact inverts compact back at the original resolution") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val in = (1 to 400).map(_ => cell(3, rnd.nextInt(64).toLong)).distinct
    val compacted = compactSet(in)
    val back = CellSetOps.uncompactCells(
        compacted.toSeq.toDF("cell"), "cell", 3)
      .collect().map(_.getLong(0)).toSet
    assert(back === in.toSet)
  }

  test("uncompact rejects cells finer than the target resolution") {
    val s = spark
    import s.implicits._
    val ex = intercept[Exception] {
      CellSetOps.uncompactCells(Seq(cell(4, 0L)).toDF("cell"), "cell", 3)
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
