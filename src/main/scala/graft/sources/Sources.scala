package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.grid.GridSpec

/** Non-parquet layer sources of the reference, re-expressed as Spark reads
  * or generated Datasets (PolyReader.c:50-150 dispatch). Shapefile binary
  * I/O lives in `sources.Shapefile`; text/CSV/generated layers here. */
object Sources {

  /** PointFile source (PointFileReader.c:34): delimited text with named X/Y
    * columns (env INPUT_FILE_XCOL/YCOL, delim COMMA|PIPE|SPACE|SEMICOLON).
    * Output: original columns + canonical `x`, `y` doubles. */
  def pointFile(spark: SparkSession, path: String,
                xcol: String, ycol: String, delim: String = ","): DataFrame = {
    val sep = delim.toUpperCase match {
      case "COMMA" => "," ; case "PIPE" => "|" ; case "SPACE" => " "
      case "SEMICOLON" => ";" ; case d => d
    }
    spark.read.option("header", "true").option("sep", sep)
      .option("inferSchema", "true").csv(path)
      .withColumn("x", col(xcol).cast("double"))
      .withColumn("y", col(ycol).cast("double"))
  }

  /** BoundingBox source (BoundingBoxReader.c:20): "x1,y1,x2,y2" literal →
    * one rectangle polygon row (broadcast-sized mask). */
  def boundingBox(spark: SparkSession, spec: String): DataFrame = {
    import spark.implicits._
    val Array(x1, y1, x2, y2) = spec.split(",").map(_.trim.toDouble)
    val (xmin, xmax) = (math.min(x1, x2), math.max(x1, x2))
    val (ymin, ymax) = (math.min(y1, y2), math.max(y1, y2))
    Seq(Seq(Seq(xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax)))
      .toDF("geom")
  }

  /** PolygonFile source (PolygonFileReader.c:27; SA_ch03_vector.md:347-351):
    * ASCII `x y` per line, blank line separates contours; auto-closed;
    * clockwise ⇒ solid, counter-clockwise ⇒ hole. One polygon per file. */
  def polygonFile(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val rings = text.linesIterator.map(_.trim).foldLeft(Vector(Vector.empty[Double])) {
      case (acc, "") if acc.last.nonEmpty => acc :+ Vector.empty
      case (acc, "") => acc
      case (acc, l) =>
        val p = l.split("\\s+").map(_.toDouble)
        acc.init :+ (acc.last ++ Vector(p(0), p(1)))
    }.filter(_.nonEmpty).map(_.toSeq)
    Seq(rings).toDF("geom")
  }

  /** Regular-grid source (regularGridReader.c:249-296): ncols×nrows cell
    * rectangles with COL/ROW attrs — GENERATED from spark.range, evenly
    * partitioned, never shuffled. Materialize only when clipping needs the
    * polygons; point→cell assignment should use closed-form GeoFunctions. */
  def regularGrid(spark: SparkSession, g: GridSpec): DataFrame =
    spark.range(g.nCells).toDF("cell_id")
      .withColumn("col", (col("cell_id") % g.ncols).cast("int") + 1)
      .withColumn("row", (col("cell_id") / g.ncols).cast("int") + 1)
      .withColumn("x0", lit(g.xorig) + (col("col") - 1) * g.xcell)
      .withColumn("y0", lit(g.yorig) + (col("row") - 1) * g.ycell)
      .withColumn("geom", array(array(
        col("x0"), col("y0"),
        col("x0") + g.xcell, col("y0"),
        col("x0") + g.xcell, col("y0") + g.ycell,
        col("x0"), col("y0") + g.ycell)))
      .drop("x0", "y0")

  /** EGrid source (EGridReader.c:36): rotated-diamond WRF-NMM grid. Cell
    * (c, r) is a diamond centered on a staggered lattice; odd rows offset by
    * dx/2 (the E-grid stagger). Generated, like regularGrid. */
  def eGrid(spark: SparkSession, name: String, xorig: Double, yorig: Double,
            dx: Double, dy: Double, ncols: Int, nrows: Int): DataFrame =
    spark.range(ncols.toLong * nrows).toDF("cell_id")
      .withColumn("col", (col("cell_id") % ncols).cast("int") + 1)
      .withColumn("row", (col("cell_id") / ncols).cast("int") + 1)
      .withColumn("cx",
        lit(xorig) + (col("col") - 1) * dx +
          when(col("row") % 2 === 0, dx / 2).otherwise(lit(0.0)))
      .withColumn("cy", lit(yorig) + (col("row") - 1) * (dy / 2))
      .withColumn("geom", array(array(
        col("cx"), col("cy") - dy / 2,
        col("cx") + dx / 2, col("cy"),
        col("cx"), col("cy") + dy / 2,
        col("cx") - dx / 2, col("cy"))))
      .drop("cx", "cy")

  /** Fractional-vegetation source (fractionalVegReader.c, dispatch
    * PolyReader.c:97): delimited landuse-fraction text keyed by (x, y) —
    * a plain CSV read with canonical coordinate columns. */
  def fractionalVeg(spark: SparkSession, path: String,
                    sep: String = ","): DataFrame =
    spark.read.option("header", "true").option("sep", sep)
      .option("inferSchema", "true").csv(path)
      .withColumn("x", col("x").cast("double"))
      .withColumn("y", col("y").cast("double"))

  /** Variable grid source (variableGridReader.c:82): a base grid whose
    * listed cells are refined into 4 children (one nesting level — the
    * reference's nested-refinement semantics over a regular parent). Child
    * cell ids are parent*4+k in a separate id space. */
  def variableGrid(spark: SparkSession, g: GridSpec,
                   refined: Set[Long]): DataFrame = {
    val base = regularGrid(spark, g)
    val refinedDf = base.where(col("cell_id").isin(refined.toSeq: _*))
    val kept = base.where(!col("cell_id").isin(refined.toSeq: _*))
      .withColumn("parent_id", col("cell_id"))
      .withColumn("depth", lit(0))
    val children = refinedDf
      .crossJoin(spark.range(4).toDF("k"))
      // integer child offsets — a bare k/2 is DOUBLE division in Spark and
      // would displace children k=1,3 by half a cell
      .withColumn("kx", (col("k") % 2).cast("double"))
      .withColumn("ky", floor(col("k") / 2).cast("double"))
      .withColumn("x0", lit(g.xorig) + (col("col") - 1) * g.xcell + col("kx") * (g.xcell / 2))
      .withColumn("y0", lit(g.yorig) + (col("row") - 1) * g.ycell + col("ky") * (g.ycell / 2))
      .withColumn("geom", array(array(
        col("x0"), col("y0"),
        col("x0") + g.xcell / 2, col("y0"),
        col("x0") + g.xcell / 2, col("y0") + g.ycell / 2,
        col("x0"), col("y0") + g.ycell / 2)))
      .withColumn("parent_id", col("cell_id"))
      .withColumn("cell_id", col("cell_id") * 4 + col("k"))
      .withColumn("depth", lit(1))
      .select("cell_id", "col", "row", "geom", "parent_id", "depth")
    kept.select("cell_id", "col", "row", "geom", "parent_id", "depth")
      .unionByName(children)
  }
}
