package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.cells.CellDomain
import graft.grid.GridSpec
import graft.spark.GeoFunctions._

/** The flagship srgcreate pipeline (srg_main.c:35, reportSurrogate
  * surrogate.c:30-563), re-expressed as declarative DataFrame algebra —
  * the same relational shape as the reference's own PG formulation
  * (pg_srgtools/pgscripts/template_polygon_noFF_withWA.csh:95-152):
  *
  *   numer(fips,col,row) = Σ contribution over W∩D∩G fragments
  *   denom(fips)         = Σ contribution over W∩D fragments
  *   frac                = numer/denom      [skip when denom < threshold]
  *   qasum               = running Σ frac per county in (row,col) order
  *
  * contribution per weight type (sumpoly.c:53-266):
  *   point:   val                  (1 in count mode)
  *   line:    val·len(frag)/len(parent_line)   (len(frag) in length mode)
  *   polygon: val·area(frag)/area(parent_poly) (area(frag) in area mode)
  * ratio is always vs the ORIGINAL weight feature (sumpoly.c:667,672).
  *
  * Scale notes: numerator/denominator are hash aggregations with map-side
  * partial combine (sparse by construction — the reference needed a custom
  * sparse struct, sumpoly.c:283-334; Spark gets it free). The county
  * dimension joins broadcast. The grid never materializes: cells are
  * closed-form column arithmetic for points, bbox-cover explode for
  * fragments. Denominators re-join numerators broadcast (one row per
  * county). The only wide exchanges are the two groupBys, both keyed
  * (fips[,cell]) — minimal for the semantics.
  */
object Surrogate {

  val OUT_COLS: Seq[String] =
    Seq("srg_code", "fips", "col", "row", "frac", "numer", "denom", "qasum")

  /** Shared tail: numerators ⋈ denominators → frac, threshold skip, qasum.
    * numer: (fips, col, row, numer); denom: (fips, denom). */
  def ratio(numer: DataFrame, denom: DataFrame, srgCode: Int,
            denomThreshold: Double = 1e-5, ordered: Boolean = true,
            keepSkipped: Boolean = false): DataFrame = {
    // #SKIPPED semantics (surrogate.c:434-452): below-threshold counties
    // normally never emit rows; with keepSkipped they flow through — frac
    // and all — so Smoke.toLines can render them with the `#SKIPPED `
    // prefix exactly like the reference's file. Zero-numerator rows are
    // skipped either way (PG: WHERE numer != 0 AND denom != 0).
    val denomPass =
      if (keepSkipped) col("denom") =!= 0.0
      else col("denom") >= denomThreshold
    val joined = numer.join(broadcast(denom), "fips")
      .where(denomPass && col("numer") =!= 0.0)
      .withColumn("frac", col("numer") / col("denom"))
    val w = Window.partitionBy("fips").orderBy("row", "col")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = joined
      .withColumn("qasum", sum("frac").over(w))
      .withColumn("srg_code", lit(srgCode))
      .select(OUT_COLS.map(col): _*)
    // global sort only when the sink needs it (SMOKE text); at 10^9 rows an
    // unneeded range-partition + sort is pure overhead (sampling pass + wide
    // exchange) — the qasum window has already sorted within counties
    if (ordered) out.orderBy("fips", "row", "col") else out
  }

  /** Point-weight surrogate (pages/ports): count mode when weight is None.
    * points must carry x, y; counties carry fips + geom. */
  def pointSurrogate(points: DataFrame, counties: DataFrame,
                     grid: GridSpec, domain: CellDomain, res: Int,
                     srgCode: Int, weight: Option[String] = None,
                     denomThreshold: Double = 1e-5,
                     saltFactor: Int = 1, ordered: Boolean = true,
                     keepSkipped: Boolean = false): DataFrame = {
    val w = weight.map(col(_).cast("double")).getOrElse(lit(1.0))
    val tagged = SpatialJoin.pointInPoly(points, counties, domain, res,
        saltFactor = saltFactor)
      // zero-weight features skip all geometry math (sumpoly.c:189,206)
      .where(w =!= 0.0)
      .select(col("fips"), col("x"), col("y"), w.as("__w"))
    // ONE pass over the (huge) point table: aggregate per (fips, cell) with
    // a NULL cell for off-grid points. The denominator — every point in its
    // county whether or not on the grid (sum1Poly over W∩D, windowed to the
    // counties' bbox not the grid's, srg_main.c:227-230) — then re-aggregates
    // the tiny per-cell table instead of rescanning the input.
    val onGrid = inGrid(gridCol(col("x"), grid), gridRow(col("y"), grid), grid)
    // persist the sparse (county × cell) matrix — the reference materializes
    // it too (PolyIntStruct, sumpoly.c:283-334); without it the broadcast
    // branch of the numer⋈denom join would re-run the full input scan
    val perCell = tagged
      .withColumn("col", when(onGrid, gridCol(col("x"), grid)))
      .withColumn("row", when(onGrid, gridRow(col("y"), grid)))
      .groupBy("fips", "col", "row").agg(sum("__w").as("numer"))
      .transform(graft.spark.PersistTracker.persist)
    val denom = perCell.groupBy("fips").agg(sum("numer").as("denom"))
    val numer = perCell.where(col("col").isNotNull && col("row").isNotNull)
    ratio(numer, denom, srgCode, denomThreshold, ordered, keepSkipped)
  }

  /** Polygon-weight surrogate (census tracts): area mode when weight None.
    * weights: (geom, [weight]); counties: (fips, bgeom as `geom`). */
  def polySurrogate(weights: DataFrame, counties: DataFrame,
                    grid: GridSpec, domain: CellDomain, res: Int,
                    srgCode: Int, weight: Option[String] = None,
                    denomThreshold: Double = 1e-5,
                    ordered: Boolean = true,
                    keepSkipped: Boolean = false): DataFrame = {
    val wexpr = weight.map(col(_).cast("double")).getOrElse(lit(0.0))
    val wts = weights
      .where(weight.map(c => col(c).cast("double") =!= 0.0).getOrElse(lit(true)))
      .withColumn("__warea", polygonAreaUdf(col("geom")))
      .where(col("__warea") > 0)
      .withColumn("__wval", wexpr)
    // Join #1: W ⋈ D with clipped fragments (polyIsect, srg_main.c:287).
    // Persisted: both the denominator and the per-cell numerator consume it —
    // the reference materializes this same grid-independent intermediate
    // (SAVE_DW_FILE/USE_DW_FILE, data_weight.c:19-160)
    val frags = SpatialJoin.polyPolyFragments(
        wts, counties.withColumnRenamed("geom", "bgeom"), domain, res)
      .transform(graft.spark.PersistTracker.persist)
    // contribution vs ORIGINAL weight area (sumpoly.c:667,672); area mode
    // uses the fragment area itself (sumpoly.c:224-247)
    val denomContrib = weight
      .map(_ => col("__wval") * (col("frag_area") / col("__warea")))
      .getOrElse(col("frag_area"))
    val denom = frags.groupBy("fips").agg(sum(denomContrib).as("denom"))
    // Join #2: (W∩D) ⋈ G — closed-form cell cover of each fragment, then
    // exact rect clip per cell (the grid side never materializes)
    val cellFrags = frags
      .withColumn("__cellid", explode(polyGridCoverCells(col("frag_geom"), grid)))
      .withColumn("__carea",
        polyCellClipArea(col("frag_geom"), col("__cellid"), grid))
      .where(col("__carea") > 0)
    val numContrib = weight
      .map(_ => col("__wval") * (col("__carea") / col("__warea")))
      .getOrElse(col("__carea"))
    val numer = cellFrags
      .withColumn("col", (col("__cellid") % grid.ncols).cast("int") + 1)
      .withColumn("row", (col("__cellid") / grid.ncols).cast("int") + 1)
      .groupBy("fips", "col", "row").agg(sum(numContrib).as("numer"))
    ratio(numer, denom, srgCode, denomThreshold, ordered = ordered,
      keepSkipped = keepSkipped)
  }

  /** Line-weight surrogate (roads): length mode when weight None.
    * lines: (line, [weight]); counties: (fips, geom).
    * `curved` = the USE_CURVED_LINES env contract (polyops.c:440-474,
    * SA_ch03_vector.md:316): all three length measures — parent line,
    * county fragment, cell piece — switch to great-circle together. */
  def lineSurrogate(lines: DataFrame, counties: DataFrame,
                    grid: GridSpec, domain: CellDomain, res: Int,
                    srgCode: Int, weight: Option[String] = None,
                    denomThreshold: Double = 1e-5,
                    curved: Boolean = false,
                    keepSkipped: Boolean = false): DataFrame = {
    val lns = lines
      .where(weight.map(c => col(c).cast("double") =!= 0.0).getOrElse(lit(true)))
      .withColumn("__wlen", lineLengthCol(col("line"), curved))
      .where(col("__wlen") > 0)
      .withColumn("__wval",
        weight.map(col(_).cast("double")).getOrElse(lit(0.0)))
    val frags = SpatialJoin.linePolyFragments(lns, counties, domain, res,
        curved = curved)
      .transform(graft.spark.PersistTracker.persist)
    val denomContrib = weight
      .map(_ => col("__wval") * (col("frag_len") / col("__wlen")))
      .getOrElse(col("frag_len"))
    val denom = frags.groupBy("fips").agg(sum(denomContrib).as("denom"))
    // per clipped piece × cell: Liang–Barsky length inside the cell
    val pieces = frags.withColumn("__piece", explode(col("frag_line")))
    val cellPieces = pieces
      .withColumn("__cellid", explode(lineGridCoverCells(col("__piece"), grid)))
      .withColumn("__clen",
        if (curved) lineCellClipLengthCurved(col("__piece"), col("__cellid"), grid)
        else lineCellClipLength(col("__piece"), col("__cellid"), grid))
      .where(col("__clen") > 0)
    val numContrib = weight
      .map(_ => col("__wval") * (col("__clen") / col("__wlen")))
      .getOrElse(col("__clen"))
    val numer = cellPieces
      .withColumn("col", (col("__cellid") % grid.ncols).cast("int") + 1)
      .withColumn("row", (col("__cellid") / grid.ncols).cast("int") + 1)
      .groupBy("fips", "col", "row").agg(sum(numContrib).as("numer"))
    ratio(numer, denom, srgCode, denomThreshold, keepSkipped = keepSkipped)
  }

  // --------------------------------------------- polygon-output surrogates

  val POLY_OUT_COLS: Seq[String] =
    Seq("srg_code", "fips", "out_id", "frac", "numer", "denom", "qasum")

  /** Shared tail for OUTPUT_FILE_TYPE=Polygon surrogates (surrogate.c:
    * 455-470 writes `code fips out_poly_id frac`): same threshold-skip and
    * keepSkipped semantics as `ratio`. The qasum accumulation order is the
    * LEXICOGRAPHIC order of the output-poly id's STRING form — the one
    * deterministic order available for any id type, and the SAME order
    * Smoke.toLinesPoly renders in (ids are strings in the file format), so
    * the printed running sum is monotone and the county's last row carries
    * the total the #REMAINDER rule needs.
    * numer: (fips, out_id, numer); denom: (fips, denom). */
  def ratioPoly(numer: DataFrame, denom: DataFrame, srgCode: Int,
                denomThreshold: Double = 1e-5, ordered: Boolean = true,
                keepSkipped: Boolean = false): DataFrame = {
    val denomPass =
      if (keepSkipped) col("denom") =!= 0.0
      else col("denom") >= denomThreshold
    val joined = numer.join(broadcast(denom), "fips")
      .where(denomPass && col("numer") =!= 0.0)
      .withColumn("frac", col("numer") / col("denom"))
    val w = Window.partitionBy("fips").orderBy(col("out_id").cast("string"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = joined
      .withColumn("qasum", sum("frac").over(w))
      .withColumn("srg_code", lit(srgCode))
      .select(POLY_OUT_COLS.map(col): _*)
    if (ordered) out.orderBy(col("fips"), col("out_id").cast("string"))
    else out
  }

  /** Point-weight numer/denom against an arbitrary output-polygon layer:
    * numerator per (county, out_id), denominator = every point in the
    * county whether or not it falls in any output polygon. */
  private def pointToPolysParts(points: DataFrame, counties: DataFrame,
                                outPolys: DataFrame, domain: CellDomain,
                                res: Int, weight: Option[String])
      : (DataFrame, DataFrame) = {
    val w = weight.map(col(_).cast("double")).getOrElse(lit(1.0))
    // county tag once; persisted because the denominator (all county
    // points) and the numerator (points also inside an output polygon,
    // an INNER second PIP) both consume it
    val tagged = SpatialJoin.pointInPoly(points, counties, domain, res)
      .where(w =!= 0.0)
      .select(col("fips"), col("x"), col("y"), w.as("__w"))
      .transform(graft.spark.PersistTracker.persist)
    val denom = tagged.groupBy("fips").agg(sum("__w").as("denom"))
    val numer = SpatialJoin.pointInPoly(tagged,
        outPolys.select(col("out_id"), col("geom")), domain, res)
      .groupBy("fips", "out_id").agg(sum("__w").as("numer"))
    (numer, denom)
  }

  /** Point-weight surrogate onto OUTPUT POLYGONS instead of grid cells
    * (srgcreate OUTPUT_FILE_TYPE=Polygon). outPolys: (out_id, geom). */
  def pointSurrogateToPolys(points: DataFrame, counties: DataFrame,
                            outPolys: DataFrame,
                            domain: CellDomain, res: Int, srgCode: Int,
                            weight: Option[String] = None,
                            denomThreshold: Double = 1e-5,
                            keepSkipped: Boolean = false): DataFrame = {
    val (numer, denom) =
      pointToPolysParts(points, counties, outPolys, domain, res, weight)
    ratioPoly(numer, denom, srgCode, denomThreshold, keepSkipped = keepSkipped)
  }

  /** Polygon-weight surrogate onto OUTPUT POLYGONS: the W∩D fragments keep
    * their geometry and clip AGAIN against the output layer — the same
    * two-intersection shape as the reference's polyIsect(W∩D, G) with G a
    * polygon layer instead of the grid. Contribution formulas match
    * polySurrogate exactly (vs the ORIGINAL weight area). */
  def polySurrogateToPolys(weights: DataFrame, counties: DataFrame,
                           outPolys: DataFrame,
                           domain: CellDomain, res: Int, srgCode: Int,
                           weight: Option[String] = None,
                           denomThreshold: Double = 1e-5,
                           keepSkipped: Boolean = false): DataFrame = {
    val (numer, denom) =
      polyToPolysParts(weights, counties, outPolys, domain, res, weight)
    ratioPoly(numer, denom, srgCode, denomThreshold, keepSkipped = keepSkipped)
  }

  private def polyToPolysParts(weights: DataFrame, counties: DataFrame,
                               outPolys: DataFrame, domain: CellDomain,
                               res: Int, weight: Option[String])
      : (DataFrame, DataFrame) = {
    val wexpr = weight.map(col(_).cast("double")).getOrElse(lit(0.0))
    val wts = weights
      .where(weight.map(c => col(c).cast("double") =!= 0.0).getOrElse(lit(true)))
      .withColumn("__warea", polygonAreaUdf(col("geom")))
      .where(col("__warea") > 0)
      .withColumn("__wval", wexpr)
    val frags = SpatialJoin.polyPolyFragments(
        wts, counties.withColumnRenamed("geom", "bgeom"), domain, res)
      .transform(graft.spark.PersistTracker.persist)
    val denomContrib = weight
      .map(_ => col("__wval") * (col("frag_area") / col("__warea")))
      .getOrElse(col("frag_area"))
    val denom = frags.groupBy("fips").agg(sum(denomContrib).as("denom"))
    // second clip: W∩D fragment geometry against the (broadcast) output
    // layer; the original weight geometry drops before the cover explode
    val wdg = SpatialJoin.polyPolyFragments(
        frags.drop("geom").withColumnRenamed("frag_area", "__wd_area"),
        outPolys.select(col("out_id"), col("geom").as("ogeom")),
        domain, res, aGeom = "frag_geom", bGeom = "ogeom",
        keepFragGeom = false)
    val numContrib = weight
      .map(_ => col("__wval") * (col("frag_area") / col("__warea")))
      .getOrElse(col("frag_area"))
    val numer = wdg.groupBy("fips", "out_id").agg(sum(numContrib).as("numer"))
    (numer, denom)
  }

  /** Line-weight surrogate onto OUTPUT POLYGONS: county line fragments
    * keep their pieces and clip again against the output layer; every
    * length measure uses the same `curved` mode (USE_CURVED_LINES). */
  def lineSurrogateToPolys(lines: DataFrame, counties: DataFrame,
                           outPolys: DataFrame,
                           domain: CellDomain, res: Int, srgCode: Int,
                           weight: Option[String] = None,
                           denomThreshold: Double = 1e-5,
                           curved: Boolean = false,
                           keepSkipped: Boolean = false): DataFrame = {
    val (numer, denom) = lineToPolysParts(lines, counties, outPolys,
      domain, res, weight, curved)
    ratioPoly(numer, denom, srgCode, denomThreshold, keepSkipped = keepSkipped)
  }

  private def lineToPolysParts(lines: DataFrame, counties: DataFrame,
                               outPolys: DataFrame, domain: CellDomain,
                               res: Int, weight: Option[String],
                               curved: Boolean): (DataFrame, DataFrame) = {
    val lns = lines
      .where(weight.map(c => col(c).cast("double") =!= 0.0).getOrElse(lit(true)))
      .withColumn("__wlen", lineLengthCol(col("line"), curved))
      .where(col("__wlen") > 0)
      .withColumn("__wval",
        weight.map(col(_).cast("double")).getOrElse(lit(0.0)))
    val wd = SpatialJoin.linePolyFragments(lns,
        counties.select(col("fips"), col("geom")), domain, res,
        curved = curved)
      .transform(graft.spark.PersistTracker.persist)
    val denomContrib = weight
      .map(_ => col("__wval") * (col("frag_len") / col("__wlen")))
      .getOrElse(col("frag_len"))
    val denom = wd.groupBy("fips").agg(sum(denomContrib).as("denom"))
    val pieces = wd.withColumnRenamed("frag_len", "__wd_len")
      .withColumn("__piece", explode(col("frag_line")))
      .drop("line", "frag_line")
    val wdg = SpatialJoin.linePolyFragments(pieces,
        outPolys.select(col("out_id"), col("geom")), domain, res,
        lineCol = "__piece", curved = curved)
    val numContrib = weight
      .map(_ => col("__wval") * (col("frag_len") / col("__wlen")))
      .getOrElse(col("frag_len"))
    val numer = wdg.groupBy("fips", "out_id").agg(sum(numContrib).as("numer"))
    (numer, denom)
  }

  /** Surrogate onto an ARBITRARY cell-polygon layer carrying COL/ROW —
    * the WRF curvilinear grid-dot variable grid
    * (variableGridReader.c:216-470, OUTPUT_FILE_TYPE=VariableGrid). The
    * standard grid SMOKE format and (row, col)-ordered qasum apply.
    * cells: (col, row, geom). */
  def surrogateToCellPolys(weightLayer: DataFrame, counties: DataFrame,
                           cells: DataFrame,
                           domain: CellDomain, res: Int, srgCode: Int,
                           kind: String,
                           weight: Option[String] = None,
                           denomThreshold: Double = 1e-5,
                           curved: Boolean = false,
                           keepSkipped: Boolean = false): DataFrame = {
    val keyed = cells.select(
      struct(col("col"), col("row")).as("out_id"), col("geom"))
    val (nById, denom) = kind match {
      case "Point" | "PointFile" =>
        pointToPolysParts(weightLayer, counties, keyed, domain, res, weight)
      case "Line" =>
        lineToPolysParts(weightLayer, counties, keyed, domain, res,
          weight, curved)
      case _ =>
        polyToPolysParts(weightLayer, counties, keyed, domain, res, weight)
    }
    val numer = nById
      .withColumn("col", col("out_id.col"))
      .withColumn("row", col("out_id.row"))
      .select("fips", "col", "row", "numer")
    ratio(numer, denom, srgCode, denomThreshold, keepSkipped = keepSkipped)
  }

  /** srgcreate OUTPUT_FILE_TYPE=EGrid (EGridReader.c geometry): the
    * surrogate runs against the staggered WRF-NMM diamonds generated from
    * the SAME GRIDDESC entry, and COL/ROW derive from the diamond id
    * ((polyID-1)%ncols+1, surrogate.c:389-432) so the standard grid SMOKE
    * format applies — including the (row, col)-ordered qasum. */
  def surrogateToEGrid(weightLayer: DataFrame, counties: DataFrame,
                       grid: GridSpec, domain: CellDomain, res: Int,
                       srgCode: Int, kind: String,
                       weight: Option[String] = None,
                       denomThreshold: Double = 1e-5,
                       curved: Boolean = false,
                       keepSkipped: Boolean = false): DataFrame = {
    val (numer, denom) = kind match {
      case "Point" | "PointFile" =>
        // CLOSED-FORM diamond assignment — diamond membership is pure
        // column arithmetic (|x−cx|·halfY + |y−cy|·halfX ≤ halfX·halfY,
        // exact on the integer lattice — no division wobble), so points
        // never touch a geometry kernel or a materialized diamond layer,
        // matching the regular-grid point path's "the grid never
        // materializes" discipline. ≤ keeps edge points in BOTH adjacent
        // diamonds — the same EDGE-in outcome the ray-cast gives.
        val halfX = grid.xcell / 2.0; val halfY = grid.ycell / 2.0
        val wcol = weight.map(col(_).cast("double")).getOrElse(lit(1.0))
        val tagged = SpatialJoin.pointInPoly(weightLayer, counties, domain, res)
          .where(wcol =!= 0.0)
          .select(col("fips"), col("x"), col("y"), wcol.as("__w"))
          .transform(graft.spark.PersistTracker.persist)
        val d = tagged.groupBy("fips").agg(sum("__w").as("denom"))
        val rm1 = floor((col("y") - lit(grid.yorig)) / halfY).cast("int")
        val cand = tagged
          .withColumn("__rm1", explode(sequence(rm1 - 1, rm1 + 1)))
          .withColumn("row", (col("__rm1") + 1).cast("int"))
          .withColumn("__off",
            when(col("row") % 2 === 0, halfX).otherwise(lit(0.0)))
          .withColumn("__cm1b",
            floor((col("x") - lit(grid.xorig) - col("__off")) / grid.xcell)
              .cast("int"))
          .withColumn("__cm1", explode(array(col("__cm1b"), col("__cm1b") + 1)))
          .withColumn("col", (col("__cm1") + 1).cast("int"))
          .withColumn("__cx",
            lit(grid.xorig) + col("__cm1") * grid.xcell + col("__off"))
          .withColumn("__cy", lit(grid.yorig) + col("__rm1") * halfY)
          .where(col("col").between(1, grid.ncols) &&
            col("row").between(1, grid.nrows) &&
            (abs(col("x") - col("__cx")) * halfY +
             abs(col("y") - col("__cy")) * halfX) <= halfX * halfY)
        val n = cand.groupBy("fips", "col", "row").agg(sum("__w").as("numer"))
        (n, d)
      case _ =>
        // line/polygon weights clip against the materialized diamonds —
        // exactly the arbitrary-cell path; eGrid already carries COL/ROW
        val diamonds = graft.sources.Sources.eGrid(weightLayer.sparkSession,
          grid.name, grid.xorig, grid.yorig, grid.xcell, grid.ycell,
          grid.ncols, grid.nrows)
        return surrogateToCellPolys(weightLayer, counties, diamonds,
          domain, res, srgCode, kind, weight, denomThreshold, curved,
          keepSkipped)
    }
    ratio(numer, denom, srgCode, denomThreshold, keepSkipped = keepSkipped)
  }
}
