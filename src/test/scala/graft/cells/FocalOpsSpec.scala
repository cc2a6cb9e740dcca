package graft.cells

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class FocalOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("focal-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("focal sum over a dense 3x3 block: center sums all, corners sum 4") {
    val s = spark
    import s.implicits._
    // cells (0..2, 0..2) with value = 10*ix + iy + 1
    val cells = (for { ix <- 0 to 2; iy <- 0 to 2 }
      yield (ix.toLong, iy.toLong, (10 * ix + iy + 1).toLong))
      .toDF("ix", "iy", "v")
    val out = FocalOps.focalSum(cells, "ix", "iy", "v", radius = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getLong(4)))).toMap
    val total = (for { ix <- 0 to 2; iy <- 0 to 2 } yield 10 * ix + iy + 1).sum
    assert(out((1L, 1L)) === ((total.toLong, 9L)))
    // corner (0,0): neighbors (0,0),(0,1),(1,0),(1,1) → 1+2+11+12
    assert(out((0L, 0L)) === ((26L, 4L)))
    // edge (0,1): (0,0),(0,1),(0,2),(1,0),(1,1),(1,2) → 1+2+3+11+12+13
    assert(out((0L, 1L)) === ((42L, 6L)))
  }

  test("isolated cell: focal sum is its own value, 1 neighbor") {
    val s = spark
    import s.implicits._
    val cells = Seq((0L, 0L, 7L), (10L, 10L, 5L)).toDF("ix", "iy", "v")
    val out = FocalOps.focalSum(cells, "ix", "iy", "v", radius = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(out((0L, 0L)) === ((7L, 1L)))
    assert(out((10L, 10L)) === ((5L, 1L)))
  }

  test("radius 2 widens the window") {
    val s = spark
    import s.implicits._
    val cells = Seq((0L, 0L, 1L), (2L, 0L, 3L), (3L, 0L, 9L))
      .toDF("ix", "iy", "v")
    val out = FocalOps.focalSum(cells, "ix", "iy", "v", radius = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(out((0L, 0L)) === ((4L, 2L)))  // reaches (2,0), not (3,0)
    assert(out((2L, 0L)) === ((13L, 3L))) // reaches all three
    assert(out((3L, 0L)) === ((12L, 2L))) // reaches (2,0)
  }
}
