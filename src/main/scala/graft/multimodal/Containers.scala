package graft.multimodal

/** Pure-JVM parsers (and fixture writers) for two trivially-decodable
  * media containers — BMP (BITMAPINFOHEADER / BITMAPCOREHEADER) and RIFF
  * WAVE PCM — so the multimodal decode path runs against genuinely parsed
  * bytes rather than the deterministic FakeCodec stand-in. Formats per the
  * public specs (Windows BMP file structure; RIFF/WAVE chunk layout). The
  * parsers validate magics, walk chunks, and fail loudly on truncated or
  * malformed input; the writers exist for fixture synthesis and the
  * round-trip property specs.
  *
  * Reference behavior anchor: the reference's raster tools consume regular
  * gridded rasters (src/raster/computeGridGOES.cpp reads GOES imagery via
  * GDAL); here the decode layer is the container header walk itself, which
  * is what a real codec plugs into (MultimodalOps.ImageCodec).
  */
object Containers {

  // little-endian primitive readers over a byte array
  private def u16(b: Array[Byte], off: Int): Int = {
    require(off + 2 <= b.length, s"truncated: need 2 bytes at $off, have ${b.length}")
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  }
  private def s32(b: Array[Byte], off: Int): Int = {
    require(off + 4 <= b.length, s"truncated: need 4 bytes at $off, have ${b.length}")
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  }
  private def u32(b: Array[Byte], off: Int): Long = s32(b, off) & 0xffffffffL

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putS32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  // ------------------------------------------------------------------ BMP

  /** Parsed BMP header facts. `height` is always positive; `topDown` keeps
    * the sign convention (negative stored height = rows top-to-bottom). */
  final case class BmpMeta(fileSize: Long, dataOffset: Long, headerSize: Long,
                           width: Int, height: Int, topDown: Boolean,
                           bpp: Int, rowStride: Int, pixelBytes: Long)

  object Bmp {
    /** Row stride: pixel rows pad to 4-byte boundaries. */
    def stride(width: Int, bpp: Int): Int = ((width * bpp + 31) / 32) * 4

    /** Write a 24bpp uncompressed BITMAPINFOHEADER BMP. `pixels` must be
      * exactly stride×|height| bytes (already padded). Negative `height`
      * writes a top-down image. */
    def write(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
      require(width > 0 && height != 0, s"bad dims ${width}x$height")
      val st = stride(width, 24)
      val h = math.abs(height)
      require(pixels.length == st * h,
        s"pixels must be stride($st)x$h = ${st * h} bytes, got ${pixels.length}")
      val out = new Array[Byte](54 + pixels.length)
      out(0) = 'B'; out(1) = 'M'
      putS32(out, 2, out.length)
      putS32(out, 10, 54)
      putS32(out, 14, 40)            // BITMAPINFOHEADER
      putS32(out, 18, width)
      putS32(out, 22, height)        // sign carries top-down
      putU16(out, 26, 1)             // planes
      putU16(out, 28, 24)            // bpp
      putS32(out, 30, 0)             // BI_RGB
      putS32(out, 34, pixels.length) // biSizeImage
      System.arraycopy(pixels, 0, out, 54, pixels.length)
      out
    }

    /** Write the ancient 12-byte BITMAPCOREHEADER variant (u16 dims, no
      * compression field) — exists so the parser's core-header branch is
      * exercised by real bytes. */
    def writeCore(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
      require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
        s"core header dims are u16: ${width}x$height")
      val st = stride(width, 24)
      require(pixels.length == st * height,
        s"pixels must be ${st * height} bytes, got ${pixels.length}")
      val off = 14 + 12
      val out = new Array[Byte](off + pixels.length)
      out(0) = 'B'; out(1) = 'M'
      putS32(out, 2, out.length)
      putS32(out, 10, off)
      putS32(out, 14, 12)            // BITMAPCOREHEADER
      putU16(out, 18, width)
      putU16(out, 20, height)
      putU16(out, 22, 1)
      putU16(out, 24, 24)
      System.arraycopy(pixels, 0, out, off, pixels.length)
      out
    }

    /** Nearest-neighbor resize of a 24bpp BMP — REAL pixel-domain work on
      * the decoded raster (not a header rewrite): source sample for output
      * (x, y) is (x·wIn div wOut, y·hIn div hOut), the standard floor
      * mapping, then the raster is re-encoded through write(). Deterministic
      * (no interpolation, pure index arithmetic), so an oracle can predict
      * every output pixel from the input synthesis formula. Accepts both
      * bottom-up and top-down inputs; output is canonical bottom-up. This
      * is the thumbnail step of an image-crawl pipeline — per-row narrow
      * work with no shuffle implications. */
    def resizeNearest(b: Array[Byte], wOut: Int, hOut: Int): Array[Byte] = {
      require(wOut > 0 && hOut > 0, s"bad target dims ${wOut}x$hOut")
      val m = meta(b)
      require(m.bpp == 24, s"resizeNearest supports 24bpp, got ${m.bpp}")
      val inOff = m.dataOffset.toInt
      val outStride = stride(wOut, 24)
      val out = new Array[Byte](outStride * hOut)
      var y = 0
      while (y < hOut) {
        val sy = (y.toLong * m.height / hOut).toInt       // image row, top = 0
        val srcRow = if (m.topDown) sy else m.height - 1 - sy
        val dstRow = hOut - 1 - y                          // bottom-up output
        var x = 0
        while (x < wOut) {
          val sx = (x.toLong * m.width / wOut).toInt
          val s = inOff + srcRow * m.rowStride + sx * 3
          val d = dstRow * outStride + x * 3
          out(d) = b(s); out(d + 1) = b(s + 1); out(d + 2) = b(s + 2)
          x += 1
        }
        y += 1
      }
      write(wOut, hOut, out)
    }

    /** Parse header facts from BMP bytes. Fails (IllegalArgumentException)
      * on bad magic, truncation, or unsupported compression. */
    def meta(b: Array[Byte]): BmpMeta = {
      require(b.length >= 26, s"truncated BMP: ${b.length} bytes")
      require(b(0) == 'B' && b(1) == 'M',
        f"not a BMP: magic 0x${b(0)}%02x 0x${b(1)}%02x")
      val fileSize = u32(b, 2)
      val dataOffset = u32(b, 10)
      val headerSize = u32(b, 14)
      val (w, hRaw, bpp) = headerSize match {
        case 12 => (u16(b, 18), u16(b, 20), u16(b, 24))
        case 40 | 52 | 56 | 108 | 124 =>
          require(b.length >= 34, s"truncated info header: ${b.length} bytes")
          val comp = u32(b, 30)
          require(comp == 0, s"unsupported compression $comp (only BI_RGB)")
          (s32(b, 18), s32(b, 22), u16(b, 28))
        case hs => throw new IllegalArgumentException(s"unknown DIB header size $hs")
      }
      require(w > 0 && hRaw != 0, s"bad dims ${w}x$hRaw")
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      val st = stride(w, bpp)
      require(dataOffset + st.toLong * h <= b.length,
        s"pixel array out of range: offset $dataOffset + ${st.toLong * h} > ${b.length}")
      BmpMeta(fileSize, dataOffset, headerSize, w, h, topDown, bpp, st, st.toLong * h)
    }
  }

  // ------------------------------------------------------------------ WAV

  final case class WavMeta(riffLen: Long, channels: Int, sampleRate: Long,
                           byteRate: Long, blockAlign: Int, bitsPerSample: Int,
                           dataLen: Long, nSamples: Long, durationUs: Long)

  object Wav {
    /** Write a PCM RIFF/WAVE file. `junkChunks` inserts that many "LIST"
      * filler chunks (of `junkLen` bytes each) before "data", so parsers
      * must genuinely walk the chunk list. `data` length must be a multiple
      * of blockAlign = channels·bits/8. */
    def write(sampleRate: Int, channels: Int, bitsPerSample: Int,
              data: Array[Byte], junkChunks: Int = 0, junkLen: Int = 0): Array[Byte] = {
      require(channels > 0 && sampleRate > 0, s"bad fmt $channels ch @ $sampleRate")
      require(bitsPerSample == 8 || bitsPerSample == 16 || bitsPerSample == 32,
        s"PCM bits must be 8/16/32, got $bitsPerSample")
      val block = channels * bitsPerSample / 8
      require(data.length % block == 0,
        s"data (${data.length}) must align to blockAlign $block")
      val junkPadded = junkLen + (junkLen & 1)           // chunks pad to even
      val junkTotal = junkChunks * (8 + junkPadded)
      val riffLen = 4 + (8 + 16) + junkTotal + (8 + data.length)
      val out = new Array[Byte](8 + riffLen)
      var p = 0
      def tag(t: String): Unit = { t.getBytes("US-ASCII").copyToArray(out, p); p += 4 }
      tag("RIFF"); putS32(out, p, riffLen); p += 4; tag("WAVE")
      tag("fmt "); putS32(out, p, 16); p += 4
      putU16(out, p, 1); p += 2                          // PCM
      putU16(out, p, channels); p += 2
      putS32(out, p, sampleRate); p += 4
      putS32(out, p, sampleRate * block); p += 4         // byteRate
      putU16(out, p, block); p += 2
      putU16(out, p, bitsPerSample); p += 2
      var j = 0
      while (j < junkChunks) {
        tag("LIST"); putS32(out, p, junkLen); p += 4
        p += junkPadded                                  // zero filler
        j += 1
      }
      tag("data"); putS32(out, p, data.length); p += 4
      System.arraycopy(data, 0, out, p, data.length)
      out
    }

    /** Parse fmt + data facts by walking the RIFF chunk list (unknown
      * chunks skipped, odd lengths padded to even per the spec). Fails on
      * bad magic, truncation, non-PCM format, or missing fmt/data. */
    def meta(b: Array[Byte]): WavMeta = {
      require(b.length >= 12, s"truncated WAV: ${b.length} bytes")
      require(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F',
        "not a RIFF file")
      require(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E',
        "RIFF is not WAVE")
      val riffLen = u32(b, 4)
      require(8 + riffLen <= b.length,
        s"truncated RIFF: declares ${8 + riffLen}, have ${b.length}")
      var p = 12
      var fmt: Option[(Int, Long, Long, Int, Int)] = None
      var dataLen = -1L
      val end = (8 + riffLen).toInt
      while (p + 8 <= end && dataLen < 0) {
        val id = new String(b, p, 4, "US-ASCII")
        val len = u32(b, p + 4)
        val body = p + 8
        require(body + len <= end, s"chunk '$id' overruns RIFF: $len bytes at $p")
        id match {
          case "fmt " =>
            require(len >= 16, s"fmt chunk too short: $len")
            val audioFormat = u16(b, body)
            require(audioFormat == 1, s"only PCM supported (format $audioFormat)")
            fmt = Some((u16(b, body + 2), u32(b, body + 4), u32(b, body + 8),
              u16(b, body + 12), u16(b, body + 14)))
          case "data" =>
            require(fmt.isDefined, "data chunk before fmt")
            dataLen = len
          case _ => ()                                   // skip unknown chunk
        }
        p = body + len.toInt + (len.toInt & 1)
      }
      require(dataLen >= 0, "no data chunk found")
      val (ch, rate, byteRate, block, bits) = fmt.get
      val nSamples = if (block == 0) 0L else dataLen / block
      val durationUs = if (rate == 0) 0L else nSamples * 1000000L / rate
      WavMeta(riffLen, ch, rate, byteRate, block, bits, dataLen, nSamples, durationUs)
    }

    /** The raw PCM sample bytes: the same validated chunk walk as meta(),
      * returning the data-chunk slice. Validation is meta()'s — calling
      * data() on bytes meta() rejects throws identically. */
    def data(b: Array[Byte]): Array[Byte] = {
      meta(b) // full validation (magic, fmt-before-data, bounds)
      val end = (8 + u32(b, 4)).toInt
      var p = 12
      while (p + 8 <= end) {
        val id = new String(b, p, 4, "US-ASCII")
        val len = u32(b, p + 4).toInt
        if (id == "data") return java.util.Arrays.copyOfRange(b, p + 8, p + 8 + len)
        p = p + 8 + len + (len & 1)
      }
      throw new IllegalArgumentException("no data chunk found") // unreachable after meta()
    }
  }
}
