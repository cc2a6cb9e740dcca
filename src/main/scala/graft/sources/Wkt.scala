package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** WKT (Well-Known Text, OGC Simple Features / ISO 19125) polygon codec —
  * the modern interchange format the reference's shapefile-only stack
  * predates. Complements the binary Shapefile codec: the same ring-array
  * geometry (`array<array<double>>`, flat x-y pairs, closing vertex NOT
  * stored) flows into every spatial operator regardless of which text or
  * binary container carried it.
  *
  * Parser accepts POLYGON and MULTIPOLYGON (rings flattened — the engine's
  * multipart semantics are signed-area based, like the reference's
  * PolyMShapeInOne merge, mims_spatl GPC conventions). Writer emits
  * canonical POLYGON with closed rings. Both are deliberately driver/
  * executor-side scalar functions wrapped as UDFs: parsing a text codec is
  * the one place a UDF is the right tool (same stance as the DBF codec) —
  * the geometry never leaves the row, so the pass stays narrow.
  */
object Wkt {

  /** Parse POLYGON/MULTIPOLYGON text to ring arrays. The innermost
    * parenthesis groups of either type are exactly the rings, so one
    * scan handles both. The closing vertex (WKT mandates first == last)
    * is dropped to match the engine's open-ring convention. */
  def parsePolygon(wkt: String): Seq[Seq[Double]] = {
    val t = wkt.trim
    val u = t.toUpperCase
    require(u.startsWith("POLYGON") || u.startsWith("MULTIPOLYGON"),
      s"not a WKT polygon: '${t.take(40)}'")
    val rings = "\\(([^()]+)\\)".r.findAllMatchIn(t).map(_.group(1)).toSeq
    require(rings.nonEmpty, s"WKT polygon with no rings: '${t.take(40)}'")
    rings.map { r =>
      val pts = r.split(",").map(_.trim).filter(_.nonEmpty).map { p =>
        val xy = p.split("\\s+")
        require(xy.length == 2, s"bad WKT coordinate '$p'")
        (xy(0).toDouble, xy(1).toDouble)
      }
      require(pts.length >= 4 && pts.head == pts.last,
        s"WKT ring must close with >= 4 points, got ${pts.length}")
      pts.dropRight(1).flatMap(p => Seq(p._1, p._2)).toSeq
    }
  }

  /** Canonical POLYGON text from ring arrays (rings closed on output;
    * whole-number coordinates print without a fractional part). */
  def toWkt(geom: Seq[Seq[Double]]): String = {
    def num(v: Double): String =
      if (v == v.toLong.toDouble) v.toLong.toString else v.toString
    val rings = geom.map { ring =>
      val pts = ring.grouped(2).map(p => s"${num(p(0))} ${num(p(1))}").toSeq
      (pts :+ pts.head).mkString("(", ", ", ")")
    }
    rings.mkString("POLYGON (", ", ", ")")
  }

  private val parseUdf = udf(parsePolygon _)
  private val writeUdf = udf(toWkt _)

  /** Column form: WKT string → `array<array<double>>` geometry. */
  def polygonCol(c: Column): Column = parseUdf(c)

  /** Column form: geometry → canonical WKT POLYGON string. */
  def toWktCol(c: Column): Column = writeUdf(c)
}
