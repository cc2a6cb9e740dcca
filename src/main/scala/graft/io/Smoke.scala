package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, Row}
import org.apache.spark.sql.functions._
import java.util.Locale
import graft.grid.GridSpec

/** SMOKE surrogate text format — sink and source.
  *
  * Format (reference writer surrogate.c:436-519, header allocate.c:756-833,
  * sample docs/User_Manual/media/sample_srg.txt):
  *
  *   #GRID\tname\txorig\tyorig\txcell\tycell\tncols\tnrows\t1\tproj\tunits\talpha\tbeta\tgamma\txcent\tycent
  *   %5d\t%s\t%5d\t%5d\t%10.8f[\t!\t%f\t%f\t%f]      (code fips col row frac ! num den qasum)
  *   #SKIPPED …          rows whose county denominator < DENOMINATOR_THRESHOLD
  *                       (surrogate.c:434-452)
  *   #REMAINDER %5d\t%s\t    0\t    0\t%10.8f[…]     per county when
  *                       |1−Σfrac| > 1e-5 and Σfrac > 1e-5 (surrogate.c:291-360)
  */
object Smoke {

  final case class ProjInfo(name: String = "LAMBERT", units: String = "meters",
                            alpha: Double = 30.0, beta: Double = 60.0,
                            gamma: Double = -100.0,
                            xcent: Double = -100.0, ycent: Double = 40.0)

  /** #GRID projection descriptor from a GRIDDESC coordinate system — the
    * reference's cname[ctype] table plus degrees-vs-meters units
    * (allocate.c:750-789) and the POLGRD3 quirk that writes the parameters
    * in (gamma, alpha, beta) order where every other family writes
    * (alpha, beta, gamma) (allocate.c:791-833). The C table stops at
    * ctype 8; 9-11 extend it with descriptive names. */
  def projInfoFor(c: graft.sources.GridDesc.CoordSys): ProjInfo = {
    val names = Map(1 -> "LAT-LON", 2 -> "LAMBERT", 3 -> "MERCATOR",
      4 -> "STEREOGRAPHIC", 5 -> "UTM", 6 -> "POLGRD3",
      7 -> "EquatorialMERCATOR", 8 -> "TransverseMERCATOR",
      9 -> "ALBERS", 10 -> "LAMBERTAZIMUTHAL", 11 -> "SINUSOIDAL")
    val units = if (c.ctype == 1) "degrees" else "meters"
    if (c.ctype == 6)
      ProjInfo(names(6), units, c.gamma, c.alpha, c.beta, c.xcent, c.ycent)
    else
      ProjInfo(names.getOrElse(c.ctype, "UNKNOWN"), units,
        c.alpha, c.beta, c.gamma, c.xcent, c.ycent)
  }

  /** @param tag output-type header tag (allocate.c:765-779): #GRID for
    *            Regular/EGrid output, #VARIABLE_GRID, #POLYGON */
  def header(g: GridSpec, p: ProjInfo, tag: String = "#GRID"): String =
    (tag + "\t%s\t%f\t%f\t%f\t%f\t%d\t%d\t%d\t%s\t%s\t%f\t%f\t%f\t%f\t%f").formatLocal(
      Locale.US, g.name, g.xorig, g.yorig, g.xcell, g.ycell, g.ncols, g.nrows,
      1, p.name, p.units, p.alpha, p.beta, p.gamma, p.xcent, p.ycent)

  /** Which QA comment fields append after `!` — each independently, like
    * the reference's WRITE_SRG_NUMERATOR / WRITE_SRG_DENOMINATOR /
    * WRITE_QASUM flags (surrogate.c:132-179: an off flag leaves its field
    * EMPTY; the `!` prints when any field is on). */
  final case class QaFields(numerator: Boolean, denominator: Boolean,
                            qasum: Boolean) {
    def any: Boolean = numerator || denominator || qasum
  }
  object QaFields {
    val All: QaFields = QaFields(true, true, true)
    val None: QaFields = QaFields(false, false, false)
  }

  private def qaSuffix(num: Double, den: Double, qs: Double,
                       f: QaFields): String =
    if (!f.any) ""
    else "\t!" +
      (if (f.numerator) "\t%f".formatLocal(Locale.US, num) else "") +
      (if (f.denominator) "\t%f".formatLocal(Locale.US, den) else "") +
      (if (f.qasum) "\t%f".formatLocal(Locale.US, qs) else "")

  private def dataLine(code: Int, fips: String, c: Int, r: Int, frac: Double,
                       qa: Option[(Double, Double, Double)],
                       prefix: String = "", fields: QaFields = QaFields.All): String = {
    val base = "%s%5d\t%s\t%5d\t%5d\t%10.8f".formatLocal(
      Locale.US, prefix, code, fips, c, r, frac)
    qa match {
      case Some((num, den, qs)) => base + qaSuffix(num, den, qs, fields)
      case None => base
    }
  }

  /** Surrogate table → SMOKE lines. Input schema: (srg_code, fips, col, row,
    * frac, numer, denom, qasum). Distributed: one in-memory group per county
    * (counties are small — ≤ cells-per-county rows), counties stream through
    * flatMapGroups; remainder rows injected at each county's end.
    *
    * @param withQa     append the `! numer denom qasum` comment fields
    * @param denomThreshold counties below it render as #SKIPPED rows */
  def toLines(srg: DataFrame, withQa: Boolean = true,
              denomThreshold: Double = 1e-5,
              fields: QaFields = QaFields.All): Dataset[String] = {
    val spark = srg.sparkSession
    import spark.implicits._
    srg.select(col("srg_code").cast("int"), col("fips").cast("string"),
        col("col").cast("int"), col("row").cast("int"),
        col("frac").cast("double"), col("numer").cast("double"),
        col("denom").cast("double"), col("qasum").cast("double"))
      .as[(Int, String, Int, Int, Double, Double, Double, Double)]
      .groupByKey { case (code, fips, _, _, _, _, _, _) => (code, fips) }
      .flatMapGroups { (key: (Int, String),
                        it: Iterator[(Int, String, Int, Int, Double, Double, Double, Double)]) =>
        val (code, fips) = key
        val rows = it.toVector.sortBy { case (_, _, c, r, _, _, _, _) => (r, c) }
        val skipped = rows.headOption.exists(_._7 < denomThreshold)
        val prefix = if (skipped) "#SKIPPED " else ""
        val lines = rows.map { case (_, _, c, r, frac, num, den, qs) =>
          dataLine(code, fips, c, r, frac,
            if (withQa) Some((num, den, qs)) else None, prefix, fields)
        }
        val qasum = rows.lastOption.map(_._8).getOrElse(0.0)
        val den = rows.headOption.map(_._7).getOrElse(0.0)
        val sumNum = rows.iterator.map(_._6).sum
        // remainder rule: surrogate.c:297 (|1-qasum|>1e-5 && qasum>1e-5)
        val rem =
          if (!skipped && math.abs(1.0 - qasum) > 1e-5 && qasum > 1e-5)
            Seq(dataLine(code, fips, 0, 0, 1.0 - qasum,
              if (withQa) Some((den - sumNum, den, 1.0 - qasum)) else None,
              "#REMAINDER ", fields))
          else Seq.empty
        lines ++ rem
      }
  }

  /** Polygon-output data line (surrogate.c:455-470): `code fips out_id
    * frac` — the out_poly_id string replaces the col/row pair. */
  private def polyLine(code: Int, fips: String, outId: String, frac: Double,
                       qa: Option[(Double, Double, Double)],
                       prefix: String = "", fields: QaFields = QaFields.All): String = {
    val base = "%s%5d\t%s\t%s\t%10.8f".formatLocal(
      Locale.US, prefix, code, fips, outId, frac)
    qa match {
      case Some((num, den, qs)) => base + qaSuffix(num, den, qs, fields)
      case None => base
    }
  }

  /** OUTPUT_FILE_TYPE=Polygon surrogate lines. Input schema: (srg_code,
    * fips, out_id, frac, numer, denom, qasum). Same distributed county
    * grouping, #SKIPPED and #REMAINDER rules as `toLines`; the remainder
    * row's out_poly_id is "0" (surrogate.c:326-334). */
  def toLinesPoly(srg: DataFrame, withQa: Boolean = true,
                  denomThreshold: Double = 1e-5,
                  fields: QaFields = QaFields.All): Dataset[String] = {
    val spark = srg.sparkSession
    import spark.implicits._
    srg.select(col("srg_code").cast("int"), col("fips").cast("string"),
        col("out_id").cast("string"), col("frac").cast("double"),
        col("numer").cast("double"), col("denom").cast("double"),
        col("qasum").cast("double"))
      .as[(Int, String, String, Double, Double, Double, Double)]
      .groupByKey { case (code, fips, _, _, _, _, _) => (code, fips) }
      .flatMapGroups { (key: (Int, String),
                        it: Iterator[(Int, String, String, Double, Double, Double, Double)]) =>
        val (code, fips) = key
        val rows = it.toVector.sortBy(_._3)
        val skipped = rows.headOption.exists(_._6 < denomThreshold)
        val prefix = if (skipped) "#SKIPPED " else ""
        val lines = rows.map { case (_, _, outId, frac, num, den, qs) =>
          polyLine(code, fips, outId, frac,
            if (withQa) Some((num, den, qs)) else None, prefix, fields)
        }
        val qasum = rows.lastOption.map(_._7).getOrElse(0.0)
        val den = rows.headOption.map(_._6).getOrElse(0.0)
        val sumNum = rows.iterator.map(_._5).sum
        val rem =
          if (!skipped && math.abs(1.0 - qasum) > 1e-5 && qasum > 1e-5)
            Seq(polyLine(code, fips, "0", 1.0 - qasum,
              if (withQa) Some((den - sumNum, den, 1.0 - qasum)) else None,
              "#REMAINDER ", fields))
          else Seq.empty
        lines ++ rem
      }
  }

  /** Write a complete OUTPUT_FILE_TYPE=Polygon SMOKE file: #POLYGON
    * header + county-ordered body (lexicographic out_poly_id — the
    * ratioPoly qasum order), remainder rows last per county. */
  def writePoly(srg: DataFrame, g: GridSpec, p: ProjInfo, path: String,
                withQa: Boolean = true,
                denomThreshold: Double = 1e-5,
                fields: QaFields = QaFields.All,
                writeHeader: Boolean = true): Unit = {
    val body = toLinesPoly(srg, withQa, denomThreshold, fields).collect()
      .sortBy { l =>
        val t = l.replaceAll("^#(SKIPPED|REMAINDER) ", "").split("\t")
        val isRemainder = if (l.startsWith("#REMAINDER")) 1 else 0
        (t(0).trim.toInt, t(1), isRemainder, t(2))
      }
    writeFile(body, g, p, path, "#POLYGON", writeHeader)
  }

  /** Single-file assembly shared by write/writePoly: optional header line
    * + pre-sorted body. */
  private def writeFile(body: Seq[String], g: GridSpec, p: ProjInfo,
                        path: String, tag: String,
                        writeHeader: Boolean): Unit = {
    val all = if (writeHeader) header(g, p, tag) +: body else body
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      all.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  /** Write a complete SMOKE file (header + ordered body). The single-file
    * coalesce is for byte-exact parity at test scale; at 100 TB callers keep
    * the Dataset[String] distributed (`toLines`) and write part files. */
  def write(srg: DataFrame, g: GridSpec, p: ProjInfo, path: String,
            withQa: Boolean = true, denomThreshold: Double = 1e-5,
            headerTag: String = "#GRID", fields: QaFields = QaFields.All,
            writeHeader: Boolean = true): Unit = {
    val spark = srg.sparkSession
    import spark.implicits._
    val body = toLines(srg, withQa, denomThreshold, fields).collect()
      .sortBy { l =>
        val t = l.replaceAll("^#(SKIPPED|REMAINDER) ", "").split("\t")
        // remainder rows carry col=row=0 but the reference flushes them
        // AFTER the county's data lines (surrogate.c:291-360) — order last
        val isRemainder = if (l.startsWith("#REMAINDER")) 1 else 0
        (t(0).trim.toInt, t(1), isRemainder, t(3).trim.toInt, t(2).trim.toInt)
      }
    writeFile(body, g, p, path, headerTag, writeHeader)
  }

  /** Distributed SMOKE sink for table-scale output: county-grouped lines
    * (remainder/skipped logic intact) written as text part files under
    * `dir/body/`, header in `dir/HEADER`. Counties are range-partitioned so
    * each part file holds whole counties in (code, fips) order; global file
    * order across parts follows the partition ranges. Consumers (Smoke.parse,
    * merge/gapfill tools) are order-independent. */
  def writeParts(srg: DataFrame, g: GridSpec, p: ProjInfo, dir: String,
                 withQa: Boolean = true, numParts: Int = 0,
                 denomThreshold: Double = 1e-5,
                 headerTag: String = "#GRID",
                 fields: QaFields = QaFields.All,
                 writeHeader: Boolean = true): Unit = {
    val parts = if (numParts > 0) numParts
                else srg.sparkSession.sparkContext.defaultParallelism
    val ranged = srg.repartitionByRange(parts, col("srg_code"), col("fips"))
    toLines(ranged, withQa, denomThreshold, fields)
      .write.mode("overwrite").text(s"$dir/body")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    if (writeHeader)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/HEADER"),
        (header(g, p, headerTag) + "\n").getBytes("UTF-8"))
  }

  /** SMOKE source: parse lines back to (srg_code, fips, col, row, frac
    * [, numer, denom, qasum]) — the merge/gapfill tools' input path
    * (merge/SurrogateFileReader.java). #SKIPPED/#REMAINDER/#GRID lines drop. */
  def parse(spark: SparkSession, lines: Dataset[String]): DataFrame = {
    import spark.implicits._
    lines.filter((l: String) => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val p = l.split("\t").map(_.trim)
        val qa = p.indexOf("!")
        val (num, den, qs) =
          if (qa >= 0 && p.length >= qa + 4)
            (p(qa + 1).toDouble, p(qa + 2).toDouble, p(qa + 3).toDouble)
          else (Double.NaN, Double.NaN, Double.NaN)
        (p(0).toInt, p(1), p(2).toInt, p(3).toInt, p(4).toDouble, num, den, qs)
      }
      .toDF("srg_code", "fips", "col", "row", "frac", "numer", "denom", "qasum")
  }

  /** Parse a #GRID header line back to its GridSpec. */
  def parseHeader(line: String): GridSpec = {
    val p = line.split("\t")
    require(p(0) == "#GRID" || p(0) == "#VARIABLE_GRID" || p(0) == "#POLYGON",
      s"not a SMOKE header: $line")
    GridSpec(p(1), p(2).toDouble, p(3).toDouble, p(4).toDouble, p(5).toDouble,
      p(6).toInt, p(7).toInt)
  }
}
