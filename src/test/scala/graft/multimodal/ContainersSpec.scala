package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import Containers._

/** BMP/WAV container codec: seeded round-trip fuzz (write → parse →
  * original facts) plus adversarial malformed-input cases — the parsers
  * must fail loudly, never mis-decode. */
class ContainersSpec extends AnyFunSuite {

  private def pixels(rnd: Random, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); rnd.nextBytes(a); a
  }

  test("BMP info-header round-trip fuzz: 200 seeded write/parse cycles") {
    val rnd = new Random(20260817L)
    for (_ <- 1 to 200) {
      val w = rnd.nextInt(200) + 1
      val h = rnd.nextInt(120) + 1
      val topDown = rnd.nextBoolean()
      val st = Bmp.stride(w, 24)
      val m = Bmp.meta(Bmp.write(w, if (topDown) -h else h, pixels(rnd, st * h)))
      assert(m.width === w)
      assert(m.height === h)
      assert(m.topDown === topDown)
      assert(m.bpp === 24)
      assert(m.rowStride === st)
      assert(m.rowStride % 4 === 0)
      assert(m.dataOffset === 54L)
      assert(m.headerSize === 40L)
      assert(m.pixelBytes === st.toLong * h)
      assert(m.fileSize === 54L + st * h)
    }
  }

  test("BMP core-header round-trip fuzz") {
    val rnd = new Random(42L)
    for (_ <- 1 to 100) {
      val w = rnd.nextInt(300) + 1
      val h = rnd.nextInt(90) + 1
      val st = Bmp.stride(w, 24)
      val m = Bmp.meta(Bmp.writeCore(w, h, pixels(rnd, st * h)))
      assert(m.headerSize === 12L)
      assert(m.dataOffset === 26L)
      assert((m.width, m.height, m.topDown) === ((w, h, false)))
    }
  }

  test("BMP stride pads odd widths to 4-byte rows") {
    assert(Bmp.stride(1, 24) === 4)
    assert(Bmp.stride(2, 24) === 8)
    assert(Bmp.stride(3, 24) === 12)
    assert(Bmp.stride(5, 24) === 16)
    assert(Bmp.stride(64, 24) === 192)
  }

  test("BMP malformed inputs fail loudly") {
    val good = Bmp.write(3, 2, new Array[Byte](Bmp.stride(3, 24) * 2))
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(intercept[IllegalArgumentException](Bmp.meta(badMagic))
      .getMessage.contains("not a BMP"))
    // truncated before the pixel array ends
    assert(intercept[IllegalArgumentException](
      Bmp.meta(java.util.Arrays.copyOf(good, good.length - 1)))
      .getMessage.contains("out of range"))
    // compressed (BI_RLE8) rejected
    val comp = good.clone(); comp(30) = 1
    assert(intercept[IllegalArgumentException](Bmp.meta(comp))
      .getMessage.contains("compression"))
    // unknown DIB header size
    val hdr = good.clone(); hdr(14) = 99
    assert(intercept[IllegalArgumentException](Bmp.meta(hdr))
      .getMessage.contains("header size"))
    // empty / tiny input
    assert(intercept[IllegalArgumentException](Bmp.meta(Array[Byte]()))
      .getMessage.contains("truncated"))
  }

  test("WAV round-trip fuzz: junk chunks, odd lengths, all PCM widths") {
    val rnd = new Random(7L)
    for (_ <- 1 to 200) {
      val rate = 4000 + rnd.nextInt(44100)
      val ch = rnd.nextInt(4) + 1
      val bits = Seq(8, 16, 32)(rnd.nextInt(3))
      val block = ch * bits / 8
      val ns = rnd.nextInt(500) + 1
      val junkChunks = rnd.nextInt(4)
      val junkLen = rnd.nextInt(33) // odd lengths exercise even-padding
      val bytes = Wav.write(rate, ch, bits, pixels(rnd, ns * block),
        junkChunks, junkLen)
      val m = Wav.meta(bytes)
      assert(m.channels === ch)
      assert(m.sampleRate === rate.toLong)
      assert(m.bitsPerSample === bits)
      assert(m.blockAlign === block)
      assert(m.byteRate === rate.toLong * block)
      assert(m.dataLen === ns.toLong * block)
      assert(m.nSamples === ns.toLong)
      assert(m.durationUs === ns.toLong * 1000000L / rate)
      assert(m.riffLen === bytes.length - 8L)
    }
  }

  test("WAV malformed inputs fail loudly") {
    val good = Wav.write(8000, 1, 16, new Array[Byte](20))
    val notRiff = good.clone(); notRiff(0) = 'X'
    assert(intercept[IllegalArgumentException](Wav.meta(notRiff))
      .getMessage.contains("not a RIFF"))
    val notWave = good.clone(); notWave(8) = 'X'
    assert(intercept[IllegalArgumentException](Wav.meta(notWave))
      .getMessage.contains("not WAVE"))
    // declared RIFF length beyond the actual bytes
    assert(intercept[IllegalArgumentException](
      Wav.meta(java.util.Arrays.copyOf(good, good.length - 4)))
      .getMessage.contains("truncated RIFF"))
    // non-PCM format code
    val alaw = good.clone(); alaw(20) = 6
    assert(intercept[IllegalArgumentException](Wav.meta(alaw))
      .getMessage.contains("only PCM"))
    // no data chunk: RIFF holding just fmt
    val fmtOnly = java.util.Arrays.copyOf(good, 12 + 8 + 16)
    fmtOnly(4) = (4 + 8 + 16).toByte; fmtOnly(5) = 0; fmtOnly(6) = 0; fmtOnly(7) = 0
    assert(intercept[IllegalArgumentException](Wav.meta(fmtOnly))
      .getMessage.contains("no data chunk"))
  }

  test("ImageIoCodec: PNG/JPEG/GIF/BMP encode→decode round-trip fuzz — " +
       "header facts match, PNG raster is bit-exact") {
    val rnd = new Random(1337)
    for (i <- 0 until 40) {
      val w = rnd.nextInt(64) + 1
      val h = rnd.nextInt(48) + 1
      val seed = rnd.nextLong() & 0x7fffffffL
      val fmt = Seq("png", "jpg", "gif", "bmp")(i % 4)
      val bytes = MultimodalOps.encodeTestImage(fmt, seed, w, h)
      val (gotFmt, gw, gh) = MultimodalOps.ImageIoCodec.headerFacts(bytes)
      val wantFmt = if (fmt == "jpg") "jpeg" else fmt
      assert(gotFmt == wantFmt && gw == w && gh == h,
        s"$fmt ${w}x$h seed=$seed → ($gotFmt, $gw, $gh)")
      if (fmt == "png" || fmt == "bmp") {
        // lossless: decoded red channel equals the synthesis closed form
        val want = (for (y <- 0 until h; x <- 0 until w)
          yield (seed * 31 + 7L * x + 13L * y) % 256).sum
        assert(MultimodalOps.ImageIoCodec.redSum(bytes) == want,
          s"$fmt raster mismatch at ${w}x$h seed=$seed")
      }
      // meta codec agrees with the header walk
      val m = MultimodalOps.ImageIoCodec.imageMeta(bytes)
      assert(m.width == w && m.height == h &&
        m.byteLen == bytes.length.toLong && m.contentHash.length == 32)
    }
  }

  test("ImageIoCodec malformed inputs fail loudly") {
    val good = MultimodalOps.encodeTestImage("png", 7L, 8, 8)
    // garbage magic: no reader claims it
    val e1 = intercept[IllegalArgumentException](
      MultimodalOps.ImageIoCodec.headerFacts(
        Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))
    assert(e1.getMessage.contains("no ImageIO reader"))
    // empty payload
    assert(intercept[IllegalArgumentException](
      MultimodalOps.ImageIoCodec.headerFacts(Array.empty[Byte]))
      .getMessage.contains("no ImageIO reader"))
    // truncated PNG: magic survives so a reader claims it, but the pixel
    // decode must fail loudly, never return a half raster silently
    val truncated = good.take(good.length / 3)
    assertThrows[Exception](
      MultimodalOps.ImageIoCodec.redSum(truncated))
  }

  test("BmpCodec plugs into decodeImageMeta as a real-bytes ImageCodec") {
    val bytes = Bmp.write(10, -4, new Array[Byte](Bmp.stride(10, 24) * 4))
    val m = MultimodalOps.BmpCodec.imageMeta(bytes)
    assert(m.width === 10)
    assert(m.height === 4)
    assert(m.byteLen === bytes.length.toLong)
    assert(m.contentHash.length === 32)
  }
}
