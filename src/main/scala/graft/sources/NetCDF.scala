package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Pure-JVM NetCDF-3 "classic" codec (CDF-1 and CDF-2/64-bit-offset),
  * implemented from the public Unidata NetCDF Classic Format Specification —
  * the binary envelope of the reference's I/O API files
  * (IoapiInputReader.c:1-387 reads them through the ioapi/netCDF C stack;
  * allocateIoapi.c:151-989 writes them). No code from the netCDF library;
  * the on-disk grammar is a published spec, like the Shapefile codec.
  *
  * Supported: dimensions (incl. one unlimited/record dim), global and
  * per-variable attributes, variable types NC_BYTE/NC_CHAR/NC_SHORT/
  * NC_INT/NC_FLOAT/NC_DOUBLE, fixed and record variables. That is the
  * complete envelope I/O API uses.
  *
  * Scale contract: I/O API files are single-node inputs in the reference
  * too (a gridded met/landuse layer, not the fact table). The parse happens
  * on the driver and the values become a DataFrame; a size guard enforces
  * the contract (same discipline as Shapefile.MaxRecords).
  */
object NetCDF {

  val MaxBytes: Long = 1L << 30 // 1 GiB driver-side envelope guard

  // nc_type tags (spec §"The Format in Detail")
  val NC_BYTE = 1; val NC_CHAR = 2; val NC_SHORT = 3
  val NC_INT = 4; val NC_FLOAT = 5; val NC_DOUBLE = 6

  private def typeSize(t: Int): Int = t match {
    case NC_BYTE | NC_CHAR => 1
    case NC_SHORT          => 2
    case NC_INT | NC_FLOAT => 4
    case NC_DOUBLE         => 8
    case _ => throw new IllegalArgumentException(s"unsupported nc_type $t")
  }

  /** length == 0 marks the record (unlimited) dimension, as in the spec. */
  final case class Dim(name: String, length: Int) {
    def isRecord: Boolean = length == 0
  }

  /** Attribute value: String (NC_CHAR), Array[Int], Array[Float],
    * Array[Double], Array[Short] or Array[Byte]. */
  final case class Att(name: String, value: Any) {
    def ncType: Int = value match {
      case _: String        => NC_CHAR
      case _: Array[Byte]   => NC_BYTE
      case _: Array[Short]  => NC_SHORT
      case _: Array[Int]    => NC_INT
      case _: Array[Float]  => NC_FLOAT
      case _: Array[Double] => NC_DOUBLE
      case v => throw new IllegalArgumentException(s"unsupported attribute value $v")
    }
    def nelems: Int = value match {
      case s: String        => s.length
      case a: Array[Byte]   => a.length
      case a: Array[Short]  => a.length
      case a: Array[Int]    => a.length
      case a: Array[Float]  => a.length
      case a: Array[Double] => a.length
    }
  }

  /** `dims` are indices into the file's dimension list, slowest-varying
    * first (record dim, if any, must be first — spec rule). */
  final case class Var(name: String, ncType: Int, dims: Seq[Int], atts: Seq[Att])

  /** An in-memory classic file. `data(name)` holds the variable's values in
    * row-major order (record dim outermost): Array[Byte]/[Short]/[Int]/
    * [Float]/[Double], or Array[Byte] of ASCII for NC_CHAR. */
  final case class NcFile(dims: Seq[Dim], gatts: Seq[Att], vars: Seq[Var],
                          data: Map[String, AnyRef]) {
    def numRecs: Int = {
      val recDim = dims.indexWhere(_.isRecord)
      if (recDim < 0) 0
      else vars.find(_.dims.headOption.contains(recDim)) match {
        case None => 0
        case Some(v) =>
          val perRec = v.dims.tail.map(d => dims(d).length.toLong).product *
            typeSize(v.ncType) max 1L
          (lengthOf(data(v.name)) * typeSize(v.ncType) / perRec).toInt
      }
    }
    def att(name: String): Option[Any] = gatts.find(_.name == name).map(_.value)
  }

  private def lengthOf(a: AnyRef): Long = a match {
    case x: Array[Byte]   => x.length
    case x: Array[Short]  => x.length
    case x: Array[Int]    => x.length
    case x: Array[Float]  => x.length
    case x: Array[Double] => x.length
  }

  private def pad4(n: Long): Long = (n + 3) & ~3L

  // ------------------------------------------------------------------ read

  def read(path: String): NcFile = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length <= MaxBytes,
      s"$path: ${bytes.length} bytes exceeds the $MaxBytes single-node envelope — use parquet for fact tables")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(b.get(0) == 'C' && b.get(1) == 'D' && b.get(2) == 'F',
      s"$path: not a NetCDF classic file")
    val version = b.get(3).toInt
    require(version == 1 || version == 2,
      s"$path: CDF version $version unsupported (classic CDF-1/CDF-2 only; netCDF-4/HDF5 is out of envelope)")
    val wideOffsets = version == 2
    var pos = 4
    val numRecsHeader = b.getInt(pos); pos += 4 // may be -1 (STREAMING)

    def readName(): String = {
      val len = b.getInt(pos); pos += 4
      val s = new String(bytes, pos, len, "US-ASCII")
      pos += pad4(len).toInt
      s
    }
    def readTaggedCount(expectTag: Int): Int = {
      val tag = b.getInt(pos); val n = b.getInt(pos + 4); pos += 8
      require(tag == expectTag || (tag == 0 && n == 0),
        s"$path: bad tag $tag at ${pos - 8} (expected $expectTag)")
      n
    }
    def readAttValues(t: Int, n: Int): Any = {
      val out: Any = t match {
        case NC_CHAR  => new String(bytes, pos, n, "US-ASCII")
        case NC_BYTE  => Array.tabulate(n)(i => bytes(pos + i))
        case NC_SHORT => Array.tabulate(n)(i => b.getShort(pos + 2 * i))
        case NC_INT   => Array.tabulate(n)(i => b.getInt(pos + 4 * i))
        case NC_FLOAT => Array.tabulate(n)(i => b.getFloat(pos + 4 * i))
        case NC_DOUBLE => Array.tabulate(n)(i => b.getDouble(pos + 8 * i))
      }
      pos += pad4(n.toLong * typeSize(t)).toInt
      out
    }
    // a malformed/CDF-5 type tag must surface as the codec's
    // IllegalArgumentException, not a MatchError from alloc/readSlab
    def checkType(t: Int, what: String): Int = {
      require(t >= NC_BYTE && t <= NC_DOUBLE,
        s"$path: unsupported nc_type $t for $what (classic types 1-6 only)")
      t
    }
    def readAttList(): Seq[Att] = {
      val n = readTaggedCount(0x0C)
      (0 until n).map { _ =>
        val name = readName()
        val t = checkType(b.getInt(pos), s"attribute '$name'"); pos += 4
        val ne = b.getInt(pos); pos += 4
        Att(name, readAttValues(t, ne))
      }
    }

    val nDims = readTaggedCount(0x0A)
    val dims = (0 until nDims).map { _ =>
      val name = readName()
      val len = b.getInt(pos); pos += 4
      Dim(name, len)
    }
    val gatts = readAttList()
    val nVars = readTaggedCount(0x0B)
    final case class RawVar(v: Var, vsize: Long, begin: Long)
    val raw = (0 until nVars).map { _ =>
      val name = readName()
      val nd = b.getInt(pos); pos += 4
      val dimIds = (0 until nd).map { _ => val d = b.getInt(pos); pos += 4; d }
      val atts = readAttList()
      val t = checkType(b.getInt(pos), s"variable '$name'"); pos += 4
      val vsize = { val v = b.getInt(pos); pos += 4; java.lang.Integer.toUnsignedLong(v) }
      val begin = if (wideOffsets) { val v = b.getLong(pos); pos += 8; v }
                  else { val v = b.getInt(pos); pos += 4; java.lang.Integer.toUnsignedLong(v) }
      RawVar(Var(name, t, dimIds, atts), vsize, begin)
    }

    val recDimId = dims.indexWhere(_.isRecord)
    val recVars = raw.filter(_.v.dims.headOption.contains(recDimId))
    val fixVars = raw.filterNot(recVars.contains)
    // per spec: record slab stride = sum of record vars' vsize; the single-
    // record-variable special case uses its unpadded size
    val recSize =
      if (recVars.length == 1)
        recVars.head.v.dims.tail.map(d => dims(d).length.toLong).product *
          typeSize(recVars.head.v.ncType)
      else recVars.map(_.vsize).sum
    val numRecs =
      if (numRecsHeader >= 0) numRecsHeader
      else if (recVars.isEmpty || recSize == 0) 0
      else ((bytes.length - recVars.map(_.begin).min) / recSize).toInt

    def readSlab(t: Int, off: Long, n: Long, dst: AnyRef, dstOff: Int): Unit = {
      val o = off.toInt
      var i = 0
      val m = n.toInt
      t match {
        case NC_BYTE | NC_CHAR =>
          System.arraycopy(bytes, o, dst.asInstanceOf[Array[Byte]], dstOff, m)
        case NC_SHORT =>
          val d = dst.asInstanceOf[Array[Short]]
          while (i < m) { d(dstOff + i) = b.getShort(o + 2 * i); i += 1 }
        case NC_INT =>
          val d = dst.asInstanceOf[Array[Int]]
          while (i < m) { d(dstOff + i) = b.getInt(o + 4 * i); i += 1 }
        case NC_FLOAT =>
          val d = dst.asInstanceOf[Array[Float]]
          while (i < m) { d(dstOff + i) = b.getFloat(o + 4 * i); i += 1 }
        case NC_DOUBLE =>
          val d = dst.asInstanceOf[Array[Double]]
          while (i < m) { d(dstOff + i) = b.getDouble(o + 8 * i); i += 1 }
      }
    }
    def alloc(t: Int, n: Long): AnyRef = t match {
      case NC_BYTE | NC_CHAR => new Array[Byte](n.toInt)
      case NC_SHORT          => new Array[Short](n.toInt)
      case NC_INT            => new Array[Int](n.toInt)
      case NC_FLOAT          => new Array[Float](n.toInt)
      case NC_DOUBLE         => new Array[Double](n.toInt)
    }

    val data = scala.collection.mutable.Map[String, AnyRef]()
    fixVars.foreach { rv =>
      val n = rv.v.dims.map(d => dims(d).length.toLong).product
      val arr = alloc(rv.v.ncType, n)
      readSlab(rv.v.ncType, rv.begin, n, arr, 0)
      data(rv.v.name) = arr
    }
    recVars.foreach { rv =>
      val perRec = rv.v.dims.tail.map(d => dims(d).length.toLong).product
      val arr = alloc(rv.v.ncType, perRec * numRecs)
      var r = 0
      while (r < numRecs) {
        readSlab(rv.v.ncType, rv.begin + r.toLong * recSize, perRec,
          arr, (r * perRec).toInt)
        r += 1
      }
      data(rv.v.name) = arr
    }
    NcFile(dims, gatts, raw.map(_.v), data.toMap)
  }

  // ----------------------------------------------------------------- write

  /** `forceWide`: Some(true/false) pins the CDF version (tests exercise
    * both); None picks CDF-1 unless offsets need 64 bits. */
  def write(path: String, f: NcFile, forceWide: Option[Boolean] = None): Unit = {
    val recDimId = f.dims.indexWhere(_.isRecord)
    f.vars.foreach { v =>
      require(v.dims.forall(d => d >= 0 && d < f.dims.length),
        s"variable ${v.name}: bad dim id")
      require(!v.dims.drop(1).contains(recDimId), // drop(1): scalar vars legal
        s"variable ${v.name}: record dim must be outermost")
      require(f.data.contains(v.name), s"variable ${v.name}: no data array")
    }
    val numRecs = f.numRecs

    def nameBytes(s: String): Long = 4 + pad4(s.length)
    def attBytes(a: Att): Long =
      nameBytes(a.name) + 8 + pad4(a.nelems.toLong * typeSize(a.ncType))
    def attListBytes(as: Seq[Att]): Long = 8 + as.map(attBytes).sum

    def vsizeOf(v: Var): Long = {
      val n = (if (v.dims.headOption.contains(recDimId)) v.dims.tail else v.dims)
        .map(d => f.dims(d).length.toLong).product
      pad4(n * typeSize(v.ncType))
    }
    val isRec: Var => Boolean = _.dims.headOption.contains(recDimId)
    val fixVars = f.vars.filterNot(isRec)
    val recVars = f.vars.filter(isRec)
    val singleRec = recVars.length == 1
    def recContrib(v: Var): Long =
      if (singleRec) // unpadded special case, like the C library
        v.dims.tail.map(d => f.dims(d).length.toLong).product * typeSize(v.ncType)
      else vsizeOf(v)
    val recSize = recVars.map(recContrib).sum

    // header size depends on offset width → decide version by trial
    def headerBytes(wide: Boolean): Long = {
      val perVar = f.vars.map(v => nameBytes(v.name) + 4 + 4L * v.dims.length +
        attListBytes(v.atts) + 4 + 4 + (if (wide) 8 else 4)).sum
      4 + 4 + // magic + numrecs
        8 + f.dims.map(d => nameBytes(d.name) + 4).sum +
        attListBytes(f.gatts) +
        8 + perVar
    }
    val fixedBytes = fixVars.map(vsizeOf).sum
    val totalFor = (wide: Boolean) =>
      headerBytes(wide) + fixedBytes + recSize * numRecs
    val wide = forceWide.getOrElse(totalFor(false) > Int.MaxValue.toLong - 1024)
    val total = totalFor(wide)
    require(total <= MaxBytes,
      s"$path: $total bytes exceeds the $MaxBytes single-node envelope")

    val out = ByteBuffer.allocate(total.toInt).order(ByteOrder.BIG_ENDIAN)
    var pos = 0
    def putInt(v: Int): Unit = { out.putInt(pos, v); pos += 4 }
    def putName(s: String): Unit = {
      putInt(s.length)
      val bs = s.getBytes("US-ASCII")
      bs.foreach { c => out.put(pos, c); pos += 1 }
      pos += (pad4(s.length) - s.length).toInt
    }
    def putAttValues(t: Int, value: Any): Unit = {
      val start = pos
      value match {
        case s: String =>
          s.getBytes("US-ASCII").foreach { c => out.put(pos, c); pos += 1 }
        case a: Array[Byte]   => a.foreach { v => out.put(pos, v); pos += 1 }
        case a: Array[Short]  => a.foreach { v => out.putShort(pos, v); pos += 2 }
        case a: Array[Int]    => a.foreach { v => out.putInt(pos, v); pos += 4 }
        case a: Array[Float]  => a.foreach { v => out.putFloat(pos, v); pos += 4 }
        case a: Array[Double] => a.foreach { v => out.putDouble(pos, v); pos += 8 }
      }
      pos = (start + pad4(pos - start)).toInt
    }
    def putAttList(as: Seq[Att]): Unit = {
      putInt(if (as.isEmpty) 0 else 0x0C); putInt(as.length)
      as.foreach { a =>
        putName(a.name); putInt(a.ncType); putInt(a.nelems)
        putAttValues(a.ncType, a.value)
      }
    }

    // magic + numrecs
    out.put(0, 'C'.toByte); out.put(1, 'D'.toByte); out.put(2, 'F'.toByte)
    out.put(3, (if (wide) 2 else 1).toByte)
    pos = 4
    putInt(numRecs)
    // dim list
    putInt(if (f.dims.isEmpty) 0 else 0x0A); putInt(f.dims.length)
    f.dims.foreach { d => putName(d.name); putInt(d.length) }
    putAttList(f.gatts)
    // var list with computed begins
    val hdr = headerBytes(wide)
    val begins = scala.collection.mutable.Map[String, Long]()
    var cursor = hdr
    fixVars.foreach { v => begins(v.name) = cursor; cursor += vsizeOf(v) }
    recVars.foreach { v => begins(v.name) = cursor; cursor += recContrib(v) }
    putInt(if (f.vars.isEmpty) 0 else 0x0B); putInt(f.vars.length)
    f.vars.foreach { v =>
      putName(v.name); putInt(v.dims.length); v.dims.foreach(putInt)
      putAttList(v.atts)
      putInt(v.ncType)
      putInt((vsizeOf(v) min 0xFFFFFFFFL).toInt)
      if (wide) { out.putLong(pos, begins(v.name)); pos += 8 }
      else putInt(begins(v.name).toInt)
    }
    require(pos.toLong == hdr, s"header layout bug: $pos != $hdr")

    def putSlab(t: Int, off: Long, src: AnyRef, srcOff: Int, n: Int): Unit = {
      val o = off.toInt
      var i = 0
      t match {
        case NC_BYTE | NC_CHAR =>
          val s = src.asInstanceOf[Array[Byte]]
          while (i < n) { out.put(o + i, s(srcOff + i)); i += 1 }
        case NC_SHORT =>
          val s = src.asInstanceOf[Array[Short]]
          while (i < n) { out.putShort(o + 2 * i, s(srcOff + i)); i += 1 }
        case NC_INT =>
          val s = src.asInstanceOf[Array[Int]]
          while (i < n) { out.putInt(o + 4 * i, s(srcOff + i)); i += 1 }
        case NC_FLOAT =>
          val s = src.asInstanceOf[Array[Float]]
          while (i < n) { out.putFloat(o + 4 * i, s(srcOff + i)); i += 1 }
        case NC_DOUBLE =>
          val s = src.asInstanceOf[Array[Double]]
          while (i < n) { out.putDouble(o + 8 * i, s(srcOff + i)); i += 1 }
      }
    }
    fixVars.foreach { v =>
      val n = v.dims.map(d => f.dims(d).length.toLong).product.toInt
      require(lengthOf(f.data(v.name)) == n,
        s"variable ${v.name}: data length ${lengthOf(f.data(v.name))} != $n")
      putSlab(v.ncType, begins(v.name), f.data(v.name), 0, n)
    }
    recVars.foreach { v =>
      val perRec = v.dims.tail.map(d => f.dims(d).length.toLong).product.toInt
      require(lengthOf(f.data(v.name)) == perRec.toLong * numRecs,
        s"variable ${v.name}: data length ${lengthOf(f.data(v.name))} != ${perRec.toLong * numRecs}")
      var r = 0
      while (r < numRecs) {
        putSlab(v.ncType, begins(v.name) + r.toLong * recSize,
          f.data(v.name), r * perRec, perRec)
        r += 1
      }
    }
    Files.write(Paths.get(path), out.array())
  }
}
