package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ImageHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .appName("imagehash-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The dHash a synthesized gray ramp must produce, derived from the
    * formula alone (no ImageIO on this side). */
  private def refHash(seed: Long, w: Int, h: Int): Long = {
    def px(x: Int, y: Int): Long = (seed * 31 + 7L * x + 13L * y) % 256
    var hash = 0L
    for (j <- 0 until 8; i <- 0 until 8) {
      val y = j * h / 8
      if (px(i * w / 9, y) > px((i + 1) * w / 9, y))
        hash |= 1L << (j * 8 + i)
    }
    hash
  }

  test("dHash over real PNG decode matches the closed-form bits, all dims 9..32 × 8..23") {
    for (seed <- Seq(0L, 1L, 7L, 255L, 256L, 9999L); w <- Seq(9, 17, 32); h <- Seq(8, 15, 23)) {
      val bytes = MultimodalOps.encodeTestImage("png", seed, w, h)
      assert(ImageHash.dHash(bytes) === refHash(seed, w, h),
        s"seed=$seed w=$w h=$h")
    }
  }

  test("bit 63 can be set (sign-bit coverage)") {
    val found = (0L until 4096L).exists { seed =>
      refHash(seed, 32, 23) < 0
    }
    assert(found, "fixture family never exercises the sign bit")
  }

  test("undecodable payload fails loud") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val e = intercept[IllegalArgumentException](ImageHash.dHash(junk))
    assert(e.getMessage.contains("undecodable"))
  }

  test("nearDupPairs equals the brute-force Hamming-≤k pair set") {
    val s = spark
    import s.implicits._
    // hashes engineered so every distance 0..8 appears
    val hashes = Seq(
      0L, 1L, 3L, 7L, 0xffL, 0x0f0fL, Long.MinValue, Long.MinValue | 1L,
      -1L, -2L, 0x8000000000000001L, 42L, 43L, 46L)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = hashes.toDF("id", "dhash")
    val got = ImageHash.nearDupPairs(df, "id", "dhash", maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (ia, a) <- hashes; (ib, b) <- hashes if ia < ib
      d = java.lang.Long.bitCount(a ^ b) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got === want)
    assert(want.nonEmpty && want.exists(_._3 == 0) && want.exists(_._3 == 3))
  }

  test("nearDupPairs rejects a band split that breaks the pigeonhole guarantee") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L)).toDF("id", "dhash")
    intercept[IllegalArgumentException](
      ImageHash.nearDupPairs(df, "id", "dhash", maxHamming = 4, bands = 4))
  }
}
