package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.geom.Geo
import graft.geom.Geo.BBox

/** Pure-JVM ESRI Shapefile (.shp) + dBASE (.dbf) reader and writer — the
  * reference's universal front door (every shipped script starts from a
  * shapefile), re-implemented from the public ESRI Shapefile Technical
  * Description and dBASE III header layout. Reference behavior being
  * matched: PolyShapeReader.c:43 (geometry + optional bbox window),
  * AttachDBFAttribute.c:41 (attach typed attributes by name, dynamic
  * schema), shpopen.c:1-1626 / dbfopen.c:1-1079 (vendored shapelib the
  * reference builds on). No code is taken from shapelib; both formats are
  * fully public specs.
  *
  * Supported shape types: 1 (Point), 3 (PolyLine), 5 (Polygon), 0 (Null —
  * skipped, like shapelib). Z/M variants are out of scope (the reference's
  * vector tools only consume 2D types).
  *
  * Geometry convention mapping: ESRI stores outer rings CLOCKWISE and holes
  * counter-clockwise; the engine uses the opposite (CCW outers — positive
  * shoelace area, Geo.signedArea). Read and write therefore REVERSE every
  * ring, making write→read a perfect round trip and each side idiomatic in
  * its own world.
  *
  * Scale contract: shapefile layers are DIMENSION inputs (counties, weight
  * tracts, masks) — the reference caps at single-node files too. The parse
  * happens on the driver and the rows become a DataFrame; the 100 TB fact
  * table is parquet. A size guard enforces the contract.
  *
  * Output schema (dynamic, from the DBF header like AttachDBFAttribute):
  *   - Point:    (rid INT, x DOUBLE, y DOUBLE, attrs…)
  *   - PolyLine: (rid INT, part INT, line ARRAY<DOUBLE>, attrs…) — one row
  *     per part; `rid` keys multi-part features (PolyMShapeInOne regroups)
  *   - Polygon:  (rid INT, geom ARRAY<ARRAY<DOUBLE>>, attrs…) — all rings
  *     of the shape (multipolygon flattened, holes by winding)
  */
object Shapefile {

  val MaxRecords = 5000000 // dimension-layer contract guard

  // ------------------------------------------------------------------ read

  /** Read `base`.shp (+ `base`.dbf when present) into a DataFrame.
    * `window`: optional bbox prefilter — shapes whose bbox doesn't intersect
    * are skipped during the scan (PolyShapeReader.c bbox param). */
  def read(spark: SparkSession, base: String, window: Option[BBox] = None): DataFrame = {
    val shp = Files.readAllBytes(Paths.get(base + ".shp"))
    val dbfPath = Paths.get(base + ".dbf")
    val dbf = if (Files.exists(dbfPath)) Some(Files.readAllBytes(dbfPath)) else None

    val buf = ByteBuffer.wrap(shp)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, s"$base.shp: bad file code (not a shapefile)")
    val fileWords = buf.getInt(24)
    val shapeType = { buf.order(ByteOrder.LITTLE_ENDIAN); buf.getInt(32) }
    require(Set(0, 1, 3, 5).contains(shapeType),
      s"$base.shp: unsupported shape type $shapeType (only Point/PolyLine/Polygon)")

    val (attrSchema, attrRows) = dbf.map(parseDbf).getOrElse((Seq.empty, Map.empty[Int, Seq[Any]]))

    val rows = scala.collection.mutable.ArrayBuffer[Row]()
    var pos = 100
    val limit = math.min(shp.length, fileWords * 2)
    var nRec = 0
    while (pos + 8 <= limit) {
      buf.order(ByteOrder.BIG_ENDIAN)
      val rid = buf.getInt(pos)
      val contentWords = buf.getInt(pos + 4)
      val contentStart = pos + 8
      buf.order(ByteOrder.LITTLE_ENDIAN)
      val recType = buf.getInt(contentStart)
      nRec += 1
      require(nRec <= MaxRecords,
        s"$base.shp exceeds $MaxRecords records — shapefiles are dimension inputs; use parquet for fact tables")
      val attrs = attrRows.getOrElse(rid - 1, Seq.fill(attrSchema.length)(null))
      recType match {
        case 0 => // null shape: skipped (shpopen semantics)
        case 1 =>
          val x = buf.getDouble(contentStart + 4)
          val y = buf.getDouble(contentStart + 12)
          if (window.forall(w => x >= w.xmin && x <= w.xmax && y >= w.ymin && y <= w.ymax))
            // Seq[Any] — a bare Seq(rid, x, y) would numeric-widen rid to Double
            rows += Row.fromSeq(Seq[Any](rid, x, y) ++ attrs)
        case 3 | 5 =>
          val bb = BBox(buf.getDouble(contentStart + 4), buf.getDouble(contentStart + 12),
                        buf.getDouble(contentStart + 20), buf.getDouble(contentStart + 28))
          if (window.forall(_.intersects(bb))) {
            val numParts = buf.getInt(contentStart + 36)
            val numPoints = buf.getInt(contentStart + 40)
            val partsOff = contentStart + 44
            val ptsOff = partsOff + 4 * numParts
            val starts = Array.tabulate(numParts)(i => buf.getInt(partsOff + 4 * i))
            val ends = Array.tabulate(numParts)(i =>
              if (i + 1 < numParts) buf.getInt(partsOff + 4 * (i + 1)) else numPoints)
            val parts = Array.tabulate(numParts) { p =>
              val n = ends(p) - starts(p)
              val flat = new Array[Double](2 * n)
              var i = 0
              while (i < n) {
                flat(2 * i) = buf.getDouble(ptsOff + 16 * (starts(p) + i))
                flat(2 * i + 1) = buf.getDouble(ptsOff + 16 * (starts(p) + i) + 8)
                i += 1
              }
              flat
            }
            if (recType == 5) {
              // drop the ESRI closing duplicate, flip winding to engine CCW
              val rings = parts.map(r => reverseRing(dropClose(r))).filter(_.length >= 6)
              if (rings.nonEmpty) rows += Row.fromSeq(Seq(rid, rings.map(_.toSeq).toSeq) ++ attrs)
            } else {
              var p = 0
              while (p < parts.length) {
                if (parts(p).length >= 4)
                  rows += Row.fromSeq(Seq(rid, p, parts(p).toSeq) ++ attrs)
                p += 1
              }
            }
          }
        case t => throw new IllegalArgumentException(s"$base.shp: record $rid has type $t != file type $shapeType")
      }
      pos = contentStart + contentWords * 2
    }

    val geomFields = shapeType match {
      case 1 => Seq(StructField("rid", IntegerType, false),
                    StructField("x", DoubleType, false), StructField("y", DoubleType, false))
      case 3 => Seq(StructField("rid", IntegerType, false),
                    StructField("part", IntegerType, false),
                    StructField("line", ArrayType(DoubleType, false), false))
      case _ => Seq(StructField("rid", IntegerType, false),
                    StructField("geom", ArrayType(ArrayType(DoubleType, false), false), false))
    }
    val schema = StructType(geomFields ++ attrSchema)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq,
        math.max(1, math.min(rows.length / 1000 + 1, spark.sparkContext.defaultParallelism))),
      schema)
  }

  private def dropClose(r: Array[Double]): Array[Double] = {
    val n = r.length / 2
    if (n >= 2 && r(0) == r(2 * n - 2) && r(1) == r(2 * n - 1)) r.dropRight(2) else r
  }

  private def reverseRing(r: Array[Double]): Array[Double] = {
    val n = r.length / 2
    val out = new Array[Double](r.length)
    var i = 0
    while (i < n) {
      out(2 * i) = r(2 * (n - 1 - i)); out(2 * i + 1) = r(2 * (n - 1 - i) + 1)
      i += 1
    }
    out
  }

  // ------------------------------------------------------------- DBF parse

  /** dBASE III header → (Spark fields, record-index → values). Types like
    * AttachDBFAttribute.c:41: N/F with decimals → double, N integral →
    * long, C/D → string, L → boolean. */
  private def parseDbf(bytes: Array[Byte]): (Seq[StructField], Map[Int, Seq[Any]]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = buf.getInt(4)
    val headerSize = java.lang.Short.toUnsignedInt(buf.getShort(8))
    val recSize = java.lang.Short.toUnsignedInt(buf.getShort(10))
    // field descriptors: 32 bytes each from offset 32 until 0x0D terminator
    final case class Fld(name: String, typ: Char, len: Int, dec: Int)
    val flds = scala.collection.mutable.ArrayBuffer[Fld]()
    var off = 32
    while (off + 32 <= headerSize && bytes(off) != 0x0d) {
      val nameBytes = bytes.slice(off, off + 11).takeWhile(_ != 0)
      val name = new String(nameBytes, "US-ASCII").trim
      val typ = bytes(off + 11).toChar
      val len = java.lang.Byte.toUnsignedInt(bytes(off + 16))
      val dec = java.lang.Byte.toUnsignedInt(bytes(off + 17))
      flds += Fld(name, typ, len, dec)
      off += 32
    }
    val fields = flds.map { f =>
      f.typ match {
        case 'N' | 'F' =>
          if (f.typ == 'N' && f.dec == 0) StructField(f.name, LongType, true)
          else StructField(f.name, DoubleType, true)
        case 'L' => StructField(f.name, BooleanType, true)
        case _   => StructField(f.name, StringType, true) // C, D, memo → string
      }
    }.toSeq
    val rows = (0 until nRec).map { r =>
      val base = headerSize + r * recSize
      var fo = base + 1 // deletion flag byte
      val vals = flds.map { f =>
        val raw = new String(bytes, fo, f.len, "US-ASCII")
        fo += f.len
        val t = raw.trim
        f.typ match {
          case 'N' if f.dec == 0 =>
            if (t.isEmpty) null
            else try java.lang.Long.valueOf(t.toLong) catch {
              // lenient like shapelib's atof-based parse: foreign writers
              // may store integral N fields as '42.' or use widths > 18
              case _: NumberFormatException =>
                try java.lang.Long.valueOf(t.toDouble.toLong)
                catch { case _: NumberFormatException => null }
            }
          case 'N' | 'F'         => if (t.isEmpty) null else java.lang.Double.valueOf(t.toDouble)
          case 'L' => t.headOption match {
            case Some(c) if "TtYy".indexOf(c) >= 0 => java.lang.Boolean.TRUE
            case Some(c) if "FfNn".indexOf(c) >= 0 => java.lang.Boolean.FALSE
            case _ => null
          }
          case _ => t
        }
      }.toSeq
      r -> vals
    }.toMap
    (fields, rows)
  }

  /** dbf2asc (dbf2asc.c:18): dump a .dbf's attribute table as CSV text
    * lines (header + rows), using the typed parser above. */
  def dbfToCsv(base: String): Seq[String] = {
    val (fields, rows) = parseDbf(Files.readAllBytes(Paths.get(base + ".dbf")))
    val header = fields.map(_.name).mkString(",")
    header +: rows.toSeq.sortBy(_._1).map { case (_, vals) =>
      vals.map(v => if (v == null) "" else v.toString).mkString(",")
    }
  }

  // ----------------------------------------------------------------- write

  /** Attribute column description for the DBF writer. */
  final case class DbfCol(name: String, typ: Char, len: Int, dec: Int = 0)

  /** Write polygons: df(geomCol ARRAY<ARRAY<DOUBLE>>, attr cols). Emits
    * base.shp, base.shx, base.dbf. Engine-CCW outers become ESRI-CW. */
  def writePolygons(df: DataFrame, base: String, geomCol: String,
                    attrs: Seq[DbfCol]): Unit = {
    val rows = guardedCollect(df, "writePolygons")
    val shapes = rows.map { r =>
      val rings = r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](
        r.fieldIndex(geomCol)).map(_.toArray).toArray
      // reverse to ESRI winding + append closing duplicate
      rings.map { ring =>
        val rev = reverseRing(ring)
        rev ++ Array(rev(0), rev(1))
      }
    }
    writeShp(base, 5, shapes)
    writeDbf(base, rows, attrs)
  }

  /** Write polylines: df(lineCol ARRAY<DOUBLE> flat, attr cols), one part
    * per row. */
  def writeLines(df: DataFrame, base: String, lineCol: String,
                 attrs: Seq[DbfCol]): Unit = {
    val rows = guardedCollect(df, "writeLines")
    val shapes = rows.map { r =>
      Array(r.getAs[scala.collection.Seq[Double]](r.fieldIndex(lineCol)).toArray)
    }
    writeShp(base, 3, shapes)
    writeDbf(base, rows, attrs)
  }

  /** Write points: df(x, y, attr cols). */
  def writePoints(df: DataFrame, base: String, x: String, y: String,
                  attrs: Seq[DbfCol]): Unit = {
    val rows = guardedCollect(df, "writePoints")
    val shapes = rows.map(r => Array(Array(
      r.getAs[Number](r.fieldIndex(x)).doubleValue,
      r.getAs[Number](r.fieldIndex(y)).doubleValue)))
    writeShp(base, 1, shapes)
    writeDbf(base, rows, attrs)
  }

  /** limit-before-collect: the dimension-layer contract must fail BEFORE
    * the driver materializes a mistakenly-huge DataFrame (same pattern as
    * SpatialJoin.collectMask). `max` is package-visible so the guard spec
    * can prove fail-fast behavior without building 5M rows. */
  private[sources] def guardedCollect(df: DataFrame, who: String,
                                      max: Int = MaxRecords): Array[Row] = {
    val rows = df.limit(max + 1).collect()
    require(rows.length <= max,
      s"$who: > $max rows — shapefiles are dimension outputs; use parquet for fact tables")
    rows
  }

  private def writeShp(base: String, shapeType: Int,
                       shapes: Array[Array[Array[Double]]]): Unit = {
    def shapeBBox(parts: Array[Array[Double]]): BBox = {
      var b = Geo.bboxOfRing(parts(0))
      var i = 1
      while (i < parts.length) {
        val c = Geo.bboxOfRing(parts(i))
        b = BBox(math.min(b.xmin, c.xmin), math.min(b.ymin, c.ymin),
                 math.max(b.xmax, c.xmax), math.max(b.ymax, c.ymax))
        i += 1
      }
      b
    }
    def contentBytes(parts: Array[Array[Double]]): Int = shapeType match {
      case 1 => 4 + 16
      case _ => 4 + 32 + 8 + 4 * parts.length + 16 * parts.map(_.length / 2).sum
    }
    val total = 100 + shapes.map(s => 8 + contentBytes(s)).sum
    val out = ByteBuffer.allocate(total)
    val shx = ByteBuffer.allocate(100 + 8 * shapes.length)
    val fileBB =
      if (shapes.isEmpty) BBox(0, 0, 0, 0)
      else shapes.map(shapeBBox).reduce((a, b) =>
        BBox(math.min(a.xmin, b.xmin), math.min(a.ymin, b.ymin),
             math.max(a.xmax, b.xmax), math.max(a.ymax, b.ymax)))
    def header(b: ByteBuffer, words: Int): Unit = {
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(0, 9994); b.putInt(24, words)
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(28, 1000); b.putInt(32, shapeType)
      b.putDouble(36, fileBB.xmin); b.putDouble(44, fileBB.ymin)
      b.putDouble(52, fileBB.xmax); b.putDouble(60, fileBB.ymax)
    }
    header(out, total / 2)
    header(shx, (100 + 8 * shapes.length) / 2)
    var pos = 100
    var rid = 1
    shapes.foreach { parts =>
      val cb = contentBytes(parts)
      shx.order(ByteOrder.BIG_ENDIAN)
      shx.putInt(100 + 8 * (rid - 1), pos / 2)
      shx.putInt(100 + 8 * (rid - 1) + 4, cb / 2)
      out.order(ByteOrder.BIG_ENDIAN)
      out.putInt(pos, rid); out.putInt(pos + 4, cb / 2)
      out.order(ByteOrder.LITTLE_ENDIAN)
      val cs = pos + 8
      out.putInt(cs, shapeType)
      if (shapeType == 1) {
        out.putDouble(cs + 4, parts(0)(0)); out.putDouble(cs + 12, parts(0)(1))
      } else {
        val bb = shapeBBox(parts)
        out.putDouble(cs + 4, bb.xmin); out.putDouble(cs + 12, bb.ymin)
        out.putDouble(cs + 20, bb.xmax); out.putDouble(cs + 28, bb.ymax)
        out.putInt(cs + 36, parts.length)
        out.putInt(cs + 40, parts.map(_.length / 2).sum)
        var po = cs + 44
        var acc = 0
        parts.foreach { p => out.putInt(po, acc); acc += p.length / 2; po += 4 }
        parts.foreach { p =>
          var i = 0
          while (i < p.length) { out.putDouble(po, p(i)); po += 8; i += 1 }
        }
      }
      pos += 8 + cb
      rid += 1
    }
    Files.write(Paths.get(base + ".shp"), out.array())
    Files.write(Paths.get(base + ".shx"), shx.array())
  }

  private def writeDbf(base: String, rows: Array[Row], attrs: Seq[DbfCol]): Unit = {
    // dBASE caps field names at 10 bytes; silent truncation could collide
    // two columns into one field — same no-silent-truncation discipline as
    // the numeric widths below
    attrs.foreach { a =>
      require(a.name.getBytes("US-ASCII").length <= 10,
        s"DBF field name '${a.name}' exceeds the 10-byte dBASE limit")
    }
    require(attrs.map(_.name).distinct.length == attrs.length,
      s"duplicate DBF field names: ${attrs.map(_.name).diff(attrs.map(_.name).distinct).distinct.mkString(", ")}")
    val headerSize = 32 + 32 * attrs.length + 1
    val recSize = 1 + attrs.map(_.len).sum
    val out = ByteBuffer.allocate(headerSize + recSize * rows.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0, 0x03.toByte)
    out.put(1, 95.toByte); out.put(2, 7.toByte); out.put(3, 26.toByte) // Y/M/D
    out.putInt(4, rows.length)
    out.putShort(8, headerSize.toShort)
    out.putShort(10, recSize.toShort)
    attrs.zipWithIndex.foreach { case (a, i) =>
      val off = 32 + 32 * i
      val nb = a.name.getBytes("US-ASCII").take(10)
      var j = 0
      while (j < nb.length) { out.put(off + j, nb(j)); j += 1 }
      out.put(off + 11, a.typ.toByte)
      out.put(off + 16, a.len.toByte)
      out.put(off + 17, a.dec.toByte)
    }
    out.put(32 + 32 * attrs.length, 0x0d.toByte)
    rows.zipWithIndex.foreach { case (r, ri) =>
      var off = headerSize + ri * recSize
      out.put(off, ' '.toByte); off += 1
      attrs.foreach { a =>
        val v = r.get(r.fieldIndex(a.name))
        val s = a.typ match {
          case 'N' if a.dec == 0 =>
            val t = if (v == null) "" else v.asInstanceOf[Number].longValue.toString
            require(t.length <= a.len,
              s"DBF field ${a.name}: value $t exceeds width ${a.len} (would truncate digits)")
            " " * (a.len - t.length) + t
          case 'N' | 'F' =>
            val t = if (v == null) ""
                    else String.format(java.util.Locale.US, s"%.${a.dec}f",
                      java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue))
            require(t.length <= a.len,
              s"DBF field ${a.name}: value $t exceeds width ${a.len} (would truncate digits)")
            " " * (a.len - t.length) + t
          case 'L' => if (v == null) "?" else if (v.asInstanceOf[Boolean]) "T" else "F"
          case _ =>
            val t = if (v == null) "" else v.toString
            t.take(a.len) + " " * math.max(0, a.len - t.length)
        }
        val bs = s.getBytes("US-ASCII")
        var j = 0
        while (j < a.len) { out.put(off + j, if (j < bs.length) bs(j) else ' '.toByte); j += 1 }
        off += a.len
      }
    }
    out.put(headerSize + recSize * rows.length, 0x1a.toByte) // EOF
    Files.write(Paths.get(base + ".dbf"), out.array())
  }
}
