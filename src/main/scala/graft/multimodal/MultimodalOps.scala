package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The actual codec layer is STUBBED (no image/audio libraries ship in this
  * environment): `FakeCodec` derives deterministic metadata/features from
  * the bytes. Everything Spark-side is real and tested — schema, batch
  * iteration via mapPartitions (the Scala analogue of mapInPandas batch
  * processing), partition sizing, and the UDF signatures a real decoder
  * would drop into.
  */
object MultimodalOps {

  // ImageIO's default stream cache is a TEMP FILE per encode/decode call
  // (create + write + delete on local disk for every image) — pure
  // per-call overhead for in-memory byte arrays. Memory-cached streams
  // produce byte-identical output; this runs once per JVM at first use
  // of any codec path (driver and executors alike).
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed media metadata carried next to the binary payload. */
  case class MediaMeta(byteLen: Long, contentHash: String,
                       width: Int, height: Int)

  /** Pluggable decode layer: implementations parse (or fake) the media
    * bytes; the Spark-side batching/schema plumbing is codec-agnostic. */
  trait ImageCodec extends Serializable {
    def imageMeta(bytes: Array[Byte]): MediaMeta
  }

  /** Real-bytes codec: parses genuine BMP container headers
    * (Containers.Bmp — magic, DIB header walk, LE field decode) and keeps
    * the hash/length bookkeeping of the fake twin. */
  object BmpCodec extends ImageCodec {
    def imageMeta(bytes: Array[Byte]): MediaMeta = {
      val m = Containers.Bmp.meta(bytes)
      val hash = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      MediaMeta(bytes.length.toLong, hash, m.width, m.height)
    }
  }

  /** Real codec for the formats that dominate actual crawls (PNG, JPEG,
    * GIF, BMP) via the JDK's own `javax.imageio` readers — pure JVM, no
    * native deps. Meta extraction is a HEADER-ONLY walk: the reader is
    * asked for dimensions without decoding pixel data (`reader.getWidth`
    * reads the IHDR / SOF marker, not the image), which is the shape that
    * survives a 100-TB crawl where full decode of every image is the job.
    * Undecodable payloads fail loudly (no reader claims the bytes). */
  object ImageIoCodec extends ImageCodec {
    def imageMeta(bytes: Array[Byte]): MediaMeta = {
      val (_, w, h) = headerFacts(bytes)
      val hash = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      MediaMeta(bytes.length.toLong, hash, w, h)
    }

    /** (formatName, width, height) from the container header only. */
    def headerFacts(bytes: Array[Byte]): (String, Int, Int) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext,
          s"undecodable image payload (${bytes.length} bytes): " +
            "no ImageIO reader claims the magic")
        val r = readers.next()
        try {
          r.setInput(iis)
          (r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0))
        } finally r.dispose()
      } finally iis.close()
    }

    /** Full pixel decode → Σ red channel. Deterministic for LOSSLESS
      * formats (PNG/BMP/GIF): the sum is a bit-exact certificate that the
      * decoded raster matches what was encoded, closed-form-predictable by
      * an oracle from the synthesis formula. (JPEG decodes fine but is
      * lossy — no closed-form oracle, so callers skip it.) */
    def redSum(bytes: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"undecodable image payload (${bytes.length} bytes)")
      var acc = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          acc += (img.getRGB(x, y) >> 16) & 0xff
          x += 1
        }
        y += 1
      }
      acc
    }
  }

  /** STUB decode — replace body with a real codec (e.g. javax.imageio /
    * ffmpeg bindings) in production; signature and batching stay as-is. */
  object FakeCodec extends ImageCodec {
    def imageMeta(bytes: Array[Byte]): MediaMeta = {
      val len = bytes.length.toLong
      val hash = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      // deterministic fake dimensions from the payload length
      MediaMeta(len, hash, (len % 640).toInt + 1, (len * 7 % 480).toInt + 1)
    }

    /** STUB frame sampling: every `stride`-th 1KB block's hash stands in
      * for a decoded video frame. */
    def sampleFrames(bytes: Array[Byte], stride: Int): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until bytes.length by (1024 * stride)).map { off =>
        val end = math.min(off + 1024, bytes.length)
        md.reset()
        md.digest(java.util.Arrays.copyOfRange(bytes, off, end))
          .take(8).map("%02x".format(_)).mkString
      }
    }

    /** STUB feature extraction: 8-dim pseudo-embedding from byte stats. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Long](8)
      var i = 0
      while (i < bytes.length) { acc(i % 8) += (bytes(i) & 0xff); i += 1 }
      acc.map(v => if (bytes.length == 0) 0f else v.toFloat / bytes.length)
    }
  }

  /** Magic-byte MIME sniffing as a PURE CODEGEN column expression (no
    * UDF): the first payload bytes hex-compared against the container
    * magics a crawl actually meets (PNG, JPEG, GIF87a/89a, BMP, RIFF/WAVE,
    * gzip, PDF, HTML prologs) — the content-type triage step that runs on
    * every fetched byte payload at crawl scale, so it must stay inside
    * whole-stage codegen. Unknown or short payloads fall through to
    * application/octet-stream; the WAVE check reads the format tag at
    * offset 8, not just the RIFF magic. */
  def sniffMimeCol(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = hex(substring(media, 1, 12))
    when(h.startsWith("89504E470D0A1A0A"), "image/png")
      .when(h.startsWith("FFD8FF"), "image/jpeg")
      .when(h.startsWith("474946383761") || h.startsWith("474946383961"),
        "image/gif")
      .when(h.startsWith("424D"), "image/bmp")
      .when(h.startsWith("52494646") &&
        hex(substring(media, 9, 4)) === "57415645", "audio/wav")
      .when(h.startsWith("1F8B"), "application/gzip")
      .when(h.startsWith("255044462D"), "application/pdf")
      .when(h.startsWith("3C21444F43") || h.startsWith("3C68746D6C") ||
        h.startsWith("3C48544D4C"), "text/html")
      .otherwise("application/octet-stream")
  }

  /** Deterministic synthesis raster → encoded container bytes via the JDK
    * writers (fmt ∈ png | jpg | gif | bmp): gray pixel value at (x, y) is
    * `(seed·31 + 7x + 13y) mod 256` — the closed form a SQL oracle can
    * recompute, so a lossless encode→decode round trip is certifiable
    * pixel for pixel. */
  def encodeTestImage(fmt: String, seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((seed * 31 + 7L * x + 13L * y) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos),
      s"no ImageIO writer for format $fmt")
    bos.toByteArray
  }

  /** PNG/JPEG facts via the JDK readers (ImageIoCodec): header-only format
    * + dimensions for every payload, plus the full-decode red-channel sum
    * as a bit-exact raster certificate for LOSSLESS formats (−1 for JPEG,
    * whose lossy raster has no closed-form oracle). Same mapPartitions
    * batch shape as the other decoders. */
  def decodeImageIoFacts(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("fmt", StringType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("red_sum", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val (fmt, w, h) = ImageIoCodec.headerFacts(bytes)
          val redSum =
            if (fmt == "jpeg") -1L else ImageIoCodec.redSum(bytes)
          Row(r.getLong(0), fmt, w.toLong, h.toLong, redSum)
        }
      }(enc)
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("byteLen", LongType, nullable = false),
    StructField("contentHash", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Batch decode via mapPartitions: one codec instance per partition, rows
    * streamed — the shape a real (expensive-init) decoder needs. Input:
    * (id: Long, media: binary); output adds the meta struct columns. */
  def decodeImageMeta(df: DataFrame, idCol: String, mediaCol: String,
                      codec: ImageCodec = FakeCodec): DataFrame = {
    val outSchema = StructType(
      StructField("id", LongType) +: metaSchema.fields.toIndexedSeq)
    val enc = Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .mapPartitions { rows =>
        // per-partition codec init happens here
        rows.map { r =>
          val m = codec.imageMeta(r.getAs[Array[Byte]]("media"))
          Row(r.getLong(0), m.byteLen, m.contentHash, m.width, m.height)
        }
      }(enc)
  }

  /** Full BMP header facts via the real container parser
    * (Containers.Bmp.meta) — same mapPartitions batch shape as
    * decodeImageMeta, every output column an integer fact a SQL oracle can
    * recompute from the fixture synthesis formulas. */
  def decodeBmpFacts(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("header_size", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("top_down", LongType, nullable = false),
      StructField("bpp", LongType, nullable = false),
      StructField("row_stride", LongType, nullable = false),
      StructField("data_offset", LongType, nullable = false),
      StructField("pixel_bytes", LongType, nullable = false),
      StructField("file_size", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val m = Containers.Bmp.meta(r.getAs[Array[Byte]]("media"))
          Row(r.getLong(0), m.headerSize, m.width.toLong, m.height.toLong,
            if (m.topDown) 1L else 0L, m.bpp.toLong, m.rowStride.toLong,
            m.dataOffset, m.pixelBytes, m.fileSize)
        }
      }(enc)
  }

  /** Image thumbnailing through the REAL pixel path: decode the 24bpp BMP,
    * nearest-neighbor resize to (wOut, hOut) (Containers.Bmp.resizeNearest),
    * re-encode, then RE-PARSE the produced container and sum its blue
    * channel — so the certificate covers decode ∘ resize ∘ encode ∘ decode
    * end to end (a bug anywhere in the chain breaks the gray sum, which
    * the oracle predicts closed-form from the synthesis formula and the
    * floor sample mapping). mapPartitions batch shape: media bytes never
    * leave the partition iterator; downstream sees integer facts only. */
  def resizeBmpFacts(df: DataFrame, idCol: String, mediaCol: String,
                     wOut: Int, hOut: Int): DataFrame = {
    require(wOut > 0 && hOut > 0, s"bad target dims ${wOut}x$hOut")
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("out_w", LongType, nullable = false),
      StructField("out_h", LongType, nullable = false),
      StructField("out_bytes", LongType, nullable = false),
      StructField("gray_sum", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val resized = Containers.Bmp.resizeNearest(
            r.getAs[Array[Byte]]("media"), wOut, hOut)
          val m = Containers.Bmp.meta(resized)
          val off = m.dataOffset.toInt
          var acc = 0L
          var y = 0
          while (y < m.height) {
            var x = 0
            while (x < m.width) {
              acc += resized(off + y * m.rowStride + x * 3) & 0xff // blue
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), m.width.toLong, m.height.toLong,
            resized.length.toLong, acc)
        }
      }(enc)
  }

  /** Audio decimation through the REAL byte path: decode 8-bit mono PCM
    * (Containers.Wav chunk walk), keep every `factor`-th sample, re-encode
    * at sampleRate/factor, RE-PARSE the produced container, and emit the
    * decimated stream's facts — sample count, output rate, and the total
    * signal energy Σ(s−128)² computed from the re-encoded bytes. Exact
    * integer arithmetic end to end; the oracle predicts every fact from
    * the synthesis formula at indices 0, factor, 2·factor, …. */
  def resampleWavFacts(df: DataFrame, idCol: String, mediaCol: String,
                       factor: Int): DataFrame = {
    require(factor > 0, s"factor must be positive (got $factor)")
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_out", LongType, nullable = false),
      StructField("out_rate", LongType, nullable = false),
      StructField("energy", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val m = Containers.Wav.meta(bytes)
          require(m.channels == 1 && m.bitsPerSample == 8,
            s"decimation expects 8-bit mono PCM, got ${m.channels}ch/${m.bitsPerSample}bit")
          require(m.sampleRate % factor == 0,
            s"rate ${m.sampleRate} not divisible by decimation factor $factor")
          val pcm = Containers.Wav.data(bytes)
          val dec = new Array[Byte]((pcm.length + factor - 1) / factor)
          var i = 0
          while (i < dec.length) { dec(i) = pcm(i * factor); i += 1 }
          val reenc = Containers.Wav.write(
            (m.sampleRate / factor).toInt, 1, 8, dec)
          val m2 = Containers.Wav.meta(reenc)
          val out = Containers.Wav.data(reenc)
          var acc = 0L
          var j = 0
          while (j < out.length) {
            val d = (out(j) & 0xff) - 128
            acc += d.toLong * d
            j += 1
          }
          Row(r.getLong(0), m2.nSamples, m2.sampleRate, acc)
        }
      }(enc)
  }

  /** Full RIFF/WAVE facts via the real chunk-walking parser
    * (Containers.Wav.meta). */
  def decodeWavFacts(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("riff_len", LongType, nullable = false),
      StructField("channels", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("byte_rate", LongType, nullable = false),
      StructField("block_align", LongType, nullable = false),
      StructField("bits", LongType, nullable = false),
      StructField("data_len", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("duration_us", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val m = Containers.Wav.meta(r.getAs[Array[Byte]]("media"))
          Row(r.getLong(0), m.riffLen, m.channels.toLong, m.sampleRate,
            m.byteRate, m.blockAlign.toLong, m.bitsPerSample.toLong,
            m.dataLen, m.nSamples, m.durationUs)
        }
      }(enc)
  }

  /** Audio feature extraction from real RIFF/WAVE bytes: per-frame signal
    * energy over 8-bit mono PCM — the silence-detection / loudness-profile
    * pass an audio-crawl pipeline runs before heavier models. Each input
    * row fans out to ceil(nSamples/frameLen) frame rows (id, frame,
    * energy) where energy = Σ (sample − 128)² over the frame — exact
    * integer arithmetic, closed-form-predictable by an oracle from the
    * synthesis formula. mapPartitions: the media bytes never outlive the
    * partition iterator; downstream sees only long triples. */
  /** Per-frame zero-crossing rate over real RIFF/WAVE bytes — the
    * cheap voiced/unvoiced + silence screen next to frame energy:
    * crossings = adjacent sample pairs WITHIN the frame whose signs
    * (v >= 0 vs v < 0, after the 8-bit 128 offset) differ. Same
    * mapPartitions batch shape as decodeWavFrameEnergy. */
  def decodeWavZeroCrossings(df: DataFrame, idCol: String, mediaCol: String,
                             frameLen: Int = 64): DataFrame = {
    require(frameLen > 0, s"frameLen must be positive (got $frameLen)")
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame", LongType, nullable = false),
      StructField("zcr", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val m = Containers.Wav.meta(bytes)
          require(m.channels == 1 && m.bitsPerSample == 8,
            s"zcr expects 8-bit mono PCM, got ${m.channels}ch/${m.bitsPerSample}bit")
          val pcm = Containers.Wav.data(bytes)
          val id = r.getLong(0)
          (0 until pcm.length by frameLen).map { off =>
            var c = 0L
            var i = off + 1
            val end = math.min(off + frameLen, pcm.length)
            while (i < end) {
              val a = (pcm(i - 1) & 0xff) - 128 >= 0
              val b = (pcm(i) & 0xff) - 128 >= 0
              if (a != b) c += 1
              i += 1
            }
            Row(id, (off / frameLen).toLong, c)
          }
        }
      }(enc)
  }

  def decodeWavFrameEnergy(df: DataFrame, idCol: String, mediaCol: String,
                           frameLen: Int = 64): DataFrame = {
    require(frameLen > 0, s"frameLen must be positive (got $frameLen)")
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame", LongType, nullable = false),
      StructField("energy", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val m = Containers.Wav.meta(bytes)
          require(m.channels == 1 && m.bitsPerSample == 8,
            s"frame energy expects 8-bit mono PCM, got ${m.channels}ch/${m.bitsPerSample}bit")
          val pcm = Containers.Wav.data(bytes)
          val id = r.getLong(0)
          (0 until pcm.length by frameLen).map { off =>
            var acc = 0L
            var i = off
            val end = math.min(off + frameLen, pcm.length)
            while (i < end) {
              val d = (pcm(i) & 0xff) - 128
              acc += d.toLong * d
              i += 1
            }
            Row(id, (off / frameLen).toLong, acc)
          }
        }
      }(enc)
  }

  /** Video frame sampling via mapPartitions: one row per sampled frame —
    * (id, frame_idx, frame_hash). The codec is the deterministic stub
    * (every `stride`-th 1 KB block hashed); the Spark-side shape is the
    * real one: per-partition codec init, one input row fanning out to
    * variable-many frame rows without ever collecting the binary payload,
    * frames ready for downstream embedding/dedup joins. */
  def sampleVideoFrames(df: DataFrame, idCol: String, mediaCol: String,
                        stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive (got $stride)")
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_hash", StringType, nullable = false)))
    val enc = Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .mapPartitions { rows =>
        // per-partition codec init happens here (stubbed)
        rows.flatMap { r =>
          FakeCodec.sampleFrames(r.getAs[Array[Byte]]("media"), stride)
            .zipWithIndex
            .map { case (h, i) => Row(r.getLong(0), i, h) }
        }
      }(enc)
  }

  /** Column-level stub feature extractor (for joins with Similarity ops). */
  val featureUdf = udf((bytes: Array[Byte]) => FakeCodec.features(bytes))

  val frameSampleUdf = udf((bytes: Array[Byte], stride: Int) =>
    FakeCodec.sampleFrames(bytes, stride))

  // ------------------------------------------------------- gzip payloads

  /** Fixture side: gzip a string deterministically (java.util.zip writes
    * MTIME = 0 and no name/comment, so the frame depends only on input). */
  val gzipUdf = udf((text: String) => {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(text.getBytes("UTF-8")); gz.close()
    bos.toByteArray
  })

  /** REAL decompression through the decode path: gunzip a compressed
    * binary payload column (pure-JVM java.util.zip — a genuine codec, not
    * a header walk) and emit the byte length + md5 of the DECOMPRESSED
    * content. The oracle recomputes both from the original text, so the
    * gate certifies the decompressed bytes end to end. Same mapPartitions
    * batch shape as the other decoders; the copy buffer is allocated once
    * per partition, the place heavier codecs put their native contexts.
    * Truncated or non-gzip payloads fail loudly (ZipException). */
  def decompressGzipFacts(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("x_md5", StringType, nullable = false)))
    val enc = Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .mapPartitions { rows =>
        val buf = new Array[Byte](8192)
        rows.map { r =>
          val media = r.getAs[Array[Byte]]("media")
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(media))
          val bos = new java.io.ByteArrayOutputStream()
          // expansion bound (the Warc.gunzipAll discipline): an untrusted
          // gzip-bomb payload fails loudly instead of OOMing the executor
          val cap = graft.sources.Warc.inflateCap(media.length)
          try {
            var n = in.read(buf)
            while (n >= 0) {
              bos.write(buf, 0, n)
              require(bos.size <= cap,
                s"gzip expansion exceeds cap for ${media.length} " +
                  "compressed bytes — refusing to inflate (gzip bomb?)")
              n = in.read(buf)
            }
          } finally in.close()
          val bytes = bos.toByteArray
          val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          Row(r.getLong(0), bytes.length.toLong,
            md5.map(b => f"$b%02x").mkString)
        }
      }(enc)
  }
}
