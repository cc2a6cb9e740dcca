package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Perceptual image hashing (dHash) + Hamming near-dup pairing for the
  * multimodal side of a crawl pipeline — the image analog of SimHash text
  * dedup. A 100 TB crawl's image near-dup pass cannot compare pixels
  * pairwise; it reduces every image to a 64-bit gradient fingerprint
  * map-side (one decode per image, embarrassingly parallel) and then finds
  * Hamming-close pairs with the same band-bucket equi-join discipline the
  * text layer uses (TextOps.simhashPairs): only (band_key, id, hash) longs
  * ever shuffle, never media bytes.
  *
  * dHash (difference hash, public recipe): decode, sample a 9×8 grid of
  * gray values (nearest-neighbor — deterministic, no interpolation
  * rounding), set bit j·8+i iff gray(i,j) > gray(i+1,j). Robust to uniform
  * brightness shifts; flips few bits under small local edits — the
  * property the Hamming join exploits.
  *
  * Reference: the reference's raster tools (raster/geo_functions.cpp) are
  * a declared non-goal; this operator serves the training-data-pipeline
  * axis (image near-dup) with the same banding math as the text layer.
  */
object ImageHash {

  // same per-JVM switch as MultimodalOps: ImageIO's default disk-backed
  // stream cache costs a temp file per decode; memory streams decode
  // byte-identically
  javax.imageio.ImageIO.setUseCache(false)

  /** 64-bit dHash of an encoded image (any ImageIO-decodable container —
    * PNG/BMP/GIF bit-exact; JPEG decodes but is lossy, so oracle-gated
    * fixtures use lossless formats). Gray = red channel of the decoded
    * RGB raster (fixtures are gray so R=G=B; a production tap would use
    * the luma transform — same shape, one more multiply). */
  def dHash(bytes: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    var hash = 0L
    var j = 0
    while (j < 8) {
      val y = j * h / 8
      var prev = (img.getRGB(0, y) >> 16) & 0xff // i=0 sample: x = 0*w/9 = 0
      var i = 0
      while (i < 8) {
        val cur = (img.getRGB((i + 1) * w / 9, y) >> 16) & 0xff
        if (prev > cur) hash |= 1L << (j * 8 + i)
        prev = cur
        i += 1
      }
      j += 1
    }
    hash
  }

  /** Batch decode → (id, dhash): mapPartitions, one row per image, media
    * bytes never outlive the partition iterator. */
  def dHashFacts(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .mapPartitions { rows =>
        rows.map { r => Row(r.getLong(0), dHash(r.getAs[Array[Byte]]("media"))) }
      }(enc)
  }

  /** Hamming distance between two 64-bit hashes as a codegen column. */
  def hammingCol(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs among (id, hash) rows: all unordered pairs with
    * Hamming distance ≤ maxHamming, via the pigeonhole band join — split
    * the 64 bits into `bands` contiguous slices (bands > maxHamming ⇒ any
    * qualifying pair agrees EXACTLY on ≥ 1 slice), bucket-join on
    * (band_idx, band_bits), dedup candidates, verify with the exact
    * popcount. Never an all-pairs product: the shuffle is keyed on band
    * buckets, candidates are the only rows that pay the verify.
    *
    * Exact-dup skew (the crawl reality: one logo repeated 10^6×) is the
    * caller's PreCollapse concern, same as the text path: collapse
    * identical hashes to a representative first when the corpus warrants
    * it. Here identical hashes collide on every band — acceptable for the
    * image-table cardinalities this gate runs at, guarded upstream by the
    * exact-dedup pass every pipeline runs before perceptual matching. */
  def nearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
                   maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(bands > maxHamming && 64 % bands == 0,
      s"need bands > maxHamming and bands | 64, got bands=$bands max=$maxHamming")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    // persisted: both sides of the band self-join consume `h`; without the
    // persist the (expensive — decode per image) hash subtree runs once
    // per join side. 16 bytes/row, corpus-sized.
    val h = hashes.select(col(idCol).cast("long").as("id"),
        col(hashCol).cast("long").as("hash"))
      .transform(graft.spark.PersistTracker.persist)
    val banded = h.select(col("id"), col("hash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("bi"),
          shiftrightunsigned(col("hash"), b * width).bitwiseAND(lit(mask))
            .as("bv"))
      }: _*)).as("band"))
      .select(col("id"), col("hash"),
        col("band.bi").as("bi"), col("band.bv").as("bv"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.hash").as("ha"), col("b.hash").as("hb"))
      .distinct() // a pair can collide on several bands
      .select(col("id_a"), col("id_b"),
        hammingCol(col("ha"), col("hb")).cast("int").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
