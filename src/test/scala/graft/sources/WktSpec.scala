package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class WktSpec extends AnyFunSuite {

  test("POLYGON parse: closing vertex dropped, whitespace tolerated") {
    val g = Wkt.parsePolygon("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(g === Seq(Seq(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0)))
    val g2 = Wkt.parsePolygon("polygon((0 0,10 0,10 10,0 10,0 0))")
    assert(g2 === g)
  }

  test("POLYGON with hole: two rings") {
    val g = Wkt.parsePolygon(
      "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))")
    assert(g.length === 2)
    assert(g(1) === Seq(2.0, 2.0, 2.0, 4.0, 4.0, 4.0, 4.0, 2.0))
  }

  test("MULTIPOLYGON: rings flattened across parts") {
    val g = Wkt.parsePolygon(
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))")
    assert(g.length === 2)
    assert(g(0).take(2) === Seq(0.0, 0.0))
    assert(g(1).take(2) === Seq(5.0, 5.0))
  }

  test("rejects non-polygon and unclosed rings") {
    intercept[IllegalArgumentException](Wkt.parsePolygon("POINT (1 2)"))
    intercept[IllegalArgumentException](
      Wkt.parsePolygon("POLYGON ((0 0, 1 0, 1 1, 0 1))")) // not closed
    intercept[IllegalArgumentException](Wkt.parsePolygon("POLYGON ()"))
  }

  test("roundtrip: parse(toWkt(g)) == g for random rect + hole geometries") {
    val rnd = new scala.util.Random(19)
    (1 to 200).foreach { _ =>
      val x0 = rnd.nextInt(1000).toDouble; val y0 = rnd.nextInt(1000).toDouble
      val w = (rnd.nextInt(500) + 1).toDouble; val h = (rnd.nextInt(500) + 1).toDouble
      val outer = Seq(x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h)
      val hole = Seq(x0 + w / 4, y0 + h / 4, x0 + w / 4, y0 + h / 2,
        x0 + w / 2, y0 + h / 2, x0 + w / 2, y0 + h / 4)
      val g = Seq(outer, hole)
      assert(Wkt.parsePolygon(Wkt.toWkt(g)) === g)
    }
  }

  test("fractional coordinates survive the roundtrip") {
    val g = Seq(Seq(0.5, 0.25, 10.125, 0.25, 10.125, 7.75, 0.5, 7.75))
    assert(Wkt.parsePolygon(Wkt.toWkt(g)) === g)
    assert(Wkt.toWkt(g).contains("10.125 0.25"))
  }
}
