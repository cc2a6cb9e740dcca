package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Geo._

class GeomSpec extends AnyFunSuite {

  /** Deterministic property-style loop (seeded; no scalatestplus bridge in
    * the offline cache, so we drive cases ourselves). */
  def forAllSeeded(n: Int)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach(_ => body(rnd))
  }

  val unitSq: Array[Double] = Array(0, 0, 10, 0, 10, 10, 0, 10)
  val withHole: Array[Array[Double]] = Array(
    Array(0, 0, 10, 0, 10, 10, 0, 10),          // outer CCW, area 100
    Array(2, 2, 2, 6, 6, 6, 6, 2))              // hole CW, area 16

  test("signed shoelace area, CCW positive") {
    assert(signedArea(unitSq) == 100.0)
    assert(signedArea(unitSq.grouped(2).toArray.reverse.flatten) == -100.0)
  }

  test("polygon area subtracts holes (polyops.c:485-497 semantics)") {
    assert(polygonArea(withHole) == 84.0)
  }

  test("line length planar") {
    assert(lineLength(Array(0, 0, 3, 4)) == 5.0)
    assert(lineLength(Array(0, 0, 3, 4, 3, 10)) == 11.0)
    assert(lineLength(Array(1, 1)) == 0.0) // degenerate
  }

  test("great-circle length (USE_CURVED_LINES=YES, polyops.c:440-474)") {
    // one degree of longitude along the equator on the reference sphere
    val oneDeg = greatCircleLength(Array(0, 0, 1, 0))
    assert(math.abs(oneDeg - 2 * math.Pi * 6370997.0 / 360) < 1e-6)
    // quarter meridian: equator to pole
    val quarter = greatCircleLength(Array(10, 0, 10, 90))
    assert(math.abs(quarter - 2 * math.Pi * 6370997.0 / 4) < 1e-6)
    // curved ≥ planar chord never holds in degrees-space, but additivity does
    val ab = greatCircleLength(Array(0, 0, 5, 5))
    val abc = greatCircleLength(Array(0, 0, 5, 5, 10, 10))
    assert(abc > ab)
  }

  test("vertex-mean centroid excludes closing duplicate (centroid.c:78-105)") {
    val (cx, cy) = vertexMeanCentroid(Array(Array(0, 0, 10, 0, 10, 10, 0, 10, 0, 0)))
    assert(cx == 5.0 && cy == 5.0)
  }

  test("PIP: in/out/edge/vertex classification (inpoly.c:41-99)") {
    assert(classifyRing(5, 5, unitSq) == IN)
    assert(classifyRing(15, 5, unitSq) == OUT)
    assert(classifyRing(5, 0, unitSq) == EDGE)
    assert(classifyRing(0, 5, unitSq) == EDGE)
    assert(classifyRing(0, 0, unitSq) == VTX)
    assert(classifyRing(10, 10, unitSq) == VTX)
  }

  test("PIP hole semantics: point in hole is OUT (sumpoly.c:184-187)") {
    assert(pointInPolygon(4, 4, withHole) == OUT)  // inside the hole
    assert(pointInPolygon(1, 1, withHole) == IN)   // solid part
    assert(pointInPolygon(7, 7, withHole) == IN)   // solid part past the hole
  }

  test("PIP hole-boundary point counts per contour parity") {
    // On the hole's edge: contained by outer (IN) and hole (EDGE→counts) →
    // even parity → OUT, matching the reference's >1-contour zeroing.
    assert(pointInPolygon(2, 4, withHole) == OUT)
  }

  test("PIP vertex exclusion (intersect.c:249-251)") {
    assert(pointInPolygon(0, 0, Array(unitSq)) == VTX)
  }

  test("seg-seg proper intersection (segseg.c)") {
    val Some((t, u, x, y)) = segSegInt(0, 0, 10, 10, 0, 10, 10, 0)
    assert(t == 0.5 && u == 0.5 && x == 5.0 && y == 5.0)
    assert(segSegInt(0, 0, 1, 0, 0, 1, 1, 1).isEmpty)     // parallel disjoint
    assert(segSegInt(0, 0, 4, 0, 2, 0, 6, 0).isDefined)   // collinear overlap
    assert(segSegInt(0, 0, 1, 0, 2, 0, 3, 0).isEmpty)     // collinear disjoint
  }

  test("rect clip of polygon: interior, partial, disjoint") {
    val r = BBox(0, 0, 5, 5)
    assert(Clip.polygonRectClipArea(Array(unitSq), r) == 25.0)
    assert(Clip.polygonRectClipArea(Array(unitSq), BBox(-5, -5, -1, -1)) == 0.0)
    assert(Clip.polygonRectClipArea(Array(unitSq), BBox(-5, -5, 50, 50)) == 100.0)
  }

  test("rect clip respects holes") {
    // clip window covers the hole entirely: 8x8 window minus 4x4 hole
    assert(Clip.polygonRectClipArea(withHole, BBox(1, 1, 9, 9)) == 64.0 - 16.0)
    // window entirely inside the hole → zero
    assert(Clip.polygonRectClipArea(withHole, BBox(3, 3, 5, 5)) == 0.0)
  }

  test("Liang–Barsky segment clip length") {
    val r = BBox(0, 0, 10, 10)
    assert(Clip.lineRectClipLength(Array(-5, 5, 15, 5), r) == 10.0)
    assert(Clip.lineRectClipLength(Array(2, 2, 8, 2), r) == 6.0)
    assert(Clip.lineRectClipLength(Array(-5, -5, -1, -1), r) == 0.0)
    // on the boundary: degenerate-width window still measures the edge run
    assert(Clip.lineRectClipLength(Array(0, 0, 0, 10), r) == 10.0)
  }

  test("line vs general polygon clip (intersect.c:274-512 algorithm)") {
    // horizontal line through the holed square: solid 0..2 and 6..10 → 6.0
    assert(math.abs(Clip.linePolyClipLength(Array(-5, 4, 15, 4), withHole) - 6.0) < 1e-9)
    // line through plain square
    assert(math.abs(Clip.linePolyClipLength(Array(-5, 5, 15, 5), Array(unitSq)) - 10.0) < 1e-9)
  }

  test("JTS general polygon clip matches rect kernel on rectangles") {
    val a = Array(Array(0.0, 0, 10, 0, 10, 10, 0, 10))
    val b = Array(Array(5.0, 5, 15, 5, 15, 15, 5, 15))
    assert(Clip.polyPolyClipArea(a, b) == 25.0)
    assert(Clip.polyPolyClipArea(a, a) == 100.0)
  }

  test("polyUnion (union.c:22) area of overlapping squares") {
    val a = Array(Array(0.0, 0, 10, 0, 10, 10, 0, 10))
    val b = Array(Array(5.0, 0, 15, 0, 15, 10, 5, 10))
    assert(Clip.unionAll(Seq(a, b)).getArea == 150.0)
  }

  // ---------------- property tests (survey §5 invariants, seeded)

  test("property: sum of grid-cell clip areas equals polygon area") {
    // random integer-lattice rectangle clipped by a 4x4 partition of its hull
    forAllSeeded(200) { rnd =>
      val x = rnd.between(-50, 50); val y = rnd.between(-50, 50)
      val w = rnd.between(1, 40); val h = rnd.between(1, 40)
      val poly = Array(Array[Double](x, y, x + w, y, x + w, y + h, x, y + h))
      val cells = for { i <- 0 until 4; j <- 0 until 4 } yield
        BBox(x - 5 + (w + 10) * i / 4.0, y - 5 + (h + 10) * j / 4.0,
             x - 5 + (w + 10) * (i + 1) / 4.0, y - 5 + (h + 10) * (j + 1) / 4.0)
      val sum = cells.map(c => Clip.polygonRectClipArea(poly, c)).sum
      assert(math.abs(sum - (w.toDouble * h)) < 1e-6)
    }
  }

  test("property: PIP invariant under translation") {
    forAllSeeded(200) { rnd =>
      val px = rnd.between(-50, 50); val py = rnd.between(-50, 50)
      val tx = rnd.between(-50, 50); val ty = rnd.between(-50, 50)
      val base = Array(Array[Double](0, 0, 20, 0, 20, 20, 0, 20))
      val shifted = base.map(r => r.zipWithIndex.map { case (v, i) =>
        v + (if (i % 2 == 0) tx else ty) })
      val a = pointInPolygon(px, py, base)
      val b = pointInPolygon(px + tx.toDouble, py + ty.toDouble, shifted)
      assert(a == b)
    }
  }

  test("property: clipped line length never exceeds original") {
    forAllSeeded(500) { rnd =>
      val line = Array[Double](rnd.between(-50, 50), rnd.between(-50, 50),
                               rnd.between(-50, 50), rnd.between(-50, 50))
      val clipped = Clip.lineRectClipLength(line, BBox(-10, -10, 10, 10))
      assert(clipped <= lineLength(line) + 1e-9)
    }
  }

  test("property: rect kernel agrees with JTS on random rect pairs") {
    forAllSeeded(200) { rnd =>
      val ax = rnd.between(-30, 30); val ay = rnd.between(-30, 30)
      val aw = rnd.between(1, 30); val ah = rnd.between(1, 30)
      val bx = rnd.between(-30, 30); val by = rnd.between(-30, 30)
      val bw = rnd.between(1, 30); val bh = rnd.between(1, 30)
      val poly = Array(Array[Double](ax, ay, ax + aw, ay, ax + aw, ay + ah, ax, ay + ah))
      val rect = BBox(bx, by, bx + bw.toDouble, by + bh.toDouble)
      val rectPoly = Array(Array[Double](bx, by, bx + bw, by, bx + bw, by + bh, bx, by + bh))
      val fast = Clip.polygonRectClipArea(poly, rect)
      val jts = Clip.polyPolyClipArea(poly, rectPoly)
      assert(math.abs(fast - jts) < 1e-9)
    }
  }
}
