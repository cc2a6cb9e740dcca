package graft.cli

import scala.collection.mutable.ArrayBuffer

/** diffsurr.exe (diffsurr.c:45-234) as a standalone driver: compare the
  * surrogate entries for one category in each of two SMOKE surrogate text
  * files, tolerating |frac_a − frac_b| ≤ eps and resynchronizing past
  * entries whose fraction is ≤ eps when the (id, col, row) keys drift out
  * of step — the C's merge-walk semantics, message shapes, and exit codes
  * (usage/read failure 1, empty category 1/2, values differ 4) preserved.
  *
  * This is deliberately a pure-JVM single-node tool, like the C: surrogate
  * text files are dimension outputs. The distributed twin over parquet
  * fact tables is PostOps.diffSurr (q33).
  */
object DiffSurr {

  final case class Srg(id: Int, col: Int, row: Int, frac: Float)

  /** stdout lines (MESG), stderr lines (WARN/ERROR), and the exit code. */
  final case class Outcome(exitCode: Int, out: Seq[String], err: Seq[String])

  private val Version = "graft diffsurr (diffsurr.c 3.6 contract)"

  def main(args: Array[String]): Unit = {
    val o = run(args, "diffsurr")
    o.out.foreach(println)
    o.err.foreach(System.err.println)
    sys.exit(o.exitCode)
  }

  def run(args: Array[String], progName: String): Outcome = {
    val out = ArrayBuffer[String]()
    val err = ArrayBuffer[String]()
    def mesg(m: String): Unit = out += m
    def warn(m: String): Unit = err += s"WARNING: $m"
    // ERROR() in io.c:61-67: stderr message then exit(errcode)
    def error(m: String, code: Int): Outcome = {
      err += s"ERROR in $progName: $m. Exiting..."
      Outcome(code, out.toSeq, err.toSeq)
    }

    mesg(Version)
    if (args.length != 5)
      return error(
        s"Usage: $progName srgt_file1 srgt_category1 srgt_file2 srgt_category2 tolerance",
        1)
    val Array(sfile1, c1, sfile2, c2, tolS) = args
    // atoi/atof semantics (diffsurr.c:257-260): junk parses as 0, so a
    // non-numeric category falls through to the empty-category error path
    // instead of crashing with a stack trace
    val scat1 = atoi(c1); val scat2 = atoi(c2); val eps = atof(tolS)
    mesg("Tolerance = %f".formatLocal(java.util.Locale.US, eps))

    val a = readSrgtFile(sfile1, scat1, mesg, warn)
    if (a == null) return error("Could not read surrogate", 1)
    if (a.isEmpty)
      return error(
        s"No surrogate entries for category $scat1 were found in file $sfile1", 1)
    val b = readSrgtFile(sfile2, scat2, mesg, warn)
    if (b == null) return error("Could not read surrogate", 1)
    if (b.isEmpty)
      return error(
        s"No surrogate entries for category $scat2 were found in file $sfile2", 2)

    if (!compareSurrogates(a, b, eps, mesg, warn))
      return error(
        s"The surrogate values differ for categories $scat1 and $scat2", 4)
    mesg("The surrogate comparison was successful!")
    Outcome(0, out.toSeq, err.toSeq)
  }

  /** C `atoi`: parse an optional-signed leading integer prefix, 0 on junk. */
  private[cli] def atoi(s: String): Int = {
    val m = "^\\s*([+-]?\\d+)".r.findFirstMatchIn(s)
    m.map(_.group(1).toInt).getOrElse(0)
  }

  /** C `atof`: leading floating-point prefix, 0.0 on junk. */
  private[cli] def atof(s: String): Float = {
    val m = "^\\s*([+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?)".r.findFirstMatchIn(s)
    m.map(_.group(1).toFloat).getOrElse(0f)
  }

  /** ReadSrgtFile (diffsurr.c:353-461): skip the one header line, drop
    * '#' comments and blanks, take the five whitespace-separated fields,
    * keep rows of the requested category, sort by (id, col, row). Returns
    * null on read/parse failure (the C's n = -1). */
  private[cli] def readSrgtFile(fname: String, scat: Int,
                                mesg: String => Unit,
                                warn: String => Unit): Array[Srg] = {
    val f = new java.io.File(fname)
    if (!f.isFile) { warn(s"Cannot open file for reading:  $fname"); return null }
    val lines = java.nio.file.Files.readAllLines(f.toPath)
    if (lines.isEmpty) {
      warn(s"Cannot read the first line of surrogate file  $fname"); return null
    }
    val acc = ArrayBuffer[Srg]()
    var line = 1
    val it = lines.iterator()
    it.next() // header
    while (it.hasNext) {
      val raw = it.next()
      if (raw.nonEmpty && raw.charAt(0) != '#') {
        val trimmed = raw.trim
        if (trimmed.nonEmpty) {
          // sscanf "%d %d %d %d %f" stops at the fifth field — trailing
          // QA columns (!\tnumer...) are ignored, like the C
          val p = trimmed.split("\\s+")
          val parsed =
            try {
              if (p.length < 5) None
              else Some((p(0).toInt, p(1).toInt, p(2).toInt, p(3).toInt,
                p(4).toFloat))
            } catch { case _: NumberFormatException => None }
          parsed match {
            case None =>
              warn("Failed to read the five required values from line " +
                s"$line of file\n$fname\n$trimmed")
              return null
            case Some((cat, id, col, row, frac)) =>
              if (cat == scat) acc += Srg(id, col, row, frac)
          }
        }
      }
      line += 1
    }
    mesg(s"Read ${acc.length} entries for category $scat from file $fname")
    // comp_surr (diffsurr.c:464-483)
    acc.sortBy(s => (s.id, s.col, s.row)).toArray
  }

  /** compare_surrogates (diffsurr.c:113-234): merge walk over the two
    * sorted arrays; a key mismatch first tries to resynchronize by
    * skipping entries whose fraction is ≤ eps, then stops the comparison;
    * fraction differences beyond eps are counted. Returns true when the
    * files agree. Like the C, the walk ends at the SHORTER file's end —
    * trailing entries present in only one file are not compared (the C
    * loop is `while (i < na && j < nb)` with no leftover check). */
  private[cli] def compareSurrogates(a: Array[Srg], b: Array[Srg], eps: Float,
                                     mesg: String => Unit,
                                     warn: String => Unit): Boolean = {
    import java.util.Locale.US
    def fmtPair(x: Srg, y: Srg) =
      "%d %d %d %f != %d %d %d %f".formatLocal(US,
        x.id, x.col, x.row, x.frac, y.id, y.col, y.row, y.frac)
    var i = 0; var j = 0
    var flag = true; var numdiffs = 0; var didbreak = false
    while (i < a.length && j < b.length && !didbreak) {
      def resync(keyA: Srg => Int, keyB: Srg => Int, what: String): Unit = {
        while (i < a.length && keyA(a(i)) < keyB(b(j)) && a(i).frac <= eps) {
          i += 1
          mesg(s"$what mismatch: Skipping small value for i=$i, val=" +
            "%f".formatLocal(US, a(i - 1).frac))
        }
        while (j < b.length && i < a.length &&
               keyA(a(i)) > keyB(b(j)) && b(j).frac <= eps) {
          j += 1
          mesg(s"$what mismatch: Skipping small value for j=$j, val=" +
            "%f".formatLocal(US, b(j - 1).frac))
        }
      }
      if (a(i).id != b(j).id) resync(_.id, _.id, "County")
      if (i >= a.length || j >= b.length) ()
      else if (a(i).id != b(j).id) {
        mesg(s"County IDs differ: ${fmtPair(a(i), b(j))}")
        flag = false; didbreak = true
      } else {
        if (a(i).col != b(j).col) resync(_.col, _.col, "Column")
        if (i >= a.length || j >= b.length) ()
        else if (a(i).col != b(j).col) {
          mesg(s"Grid cell columns differ: ${fmtPair(a(i), b(j))}")
          flag = false; didbreak = true
        } else {
          if (a(i).row != b(j).row) resync(_.row, _.row, "Row")
          if (i >= a.length || j >= b.length) ()
          else if (a(i).row != b(j).row) {
            mesg(s"Grid cell rows differ: ${fmtPair(a(i), b(j))}")
            flag = false; didbreak = true
          } else {
            if (math.abs(a(i).frac - b(j).frac) > eps) {
              mesg("Fractions differ for %d, %d, %d: %f vs %f, diff=%f"
                .formatLocal(US, a(i).id, a(i).col, a(i).row,
                  a(i).frac, b(j).frac, a(i).frac - b(j).frac))
              flag = false; numdiffs += 1
            }
            i += 1; j += 1
          }
        }
      }
    }
    if (didbreak) {
      warn("Comparison stopped because ID or grid cell differed")
      return flag
    }
    if (numdiffs > 0)
      warn(s"$numdiffs total differences out of ${a.length} possible")
    flag
  }
}
