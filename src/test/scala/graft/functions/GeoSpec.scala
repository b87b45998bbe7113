package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {
  private def quad(x: Double, y: Double, s: Double): String =
    s"POLYGON(($x $y, ${x + s} $y, ${x + s} ${y + s}, $x ${y + s}, $x $y))"

  test("overlapping quads intersect") {
    assert(Geo.wktIntersects(quad(0, 0, 2), quad(1, 1, 2)))
  }
  test("touching quads intersect (shapely semantics)") {
    assert(Geo.wktIntersects(quad(0, 0, 1), quad(1, 0, 1)))
  }
  test("disjoint quads do not intersect") {
    assert(!Geo.wktIntersects(quad(0, 0, 1), quad(5, 5, 1)))
  }
  test("containment intersects") {
    assert(Geo.wktIntersects(quad(0, 0, 10), quad(2, 2, 1)))
  }

  test("KML AOI to WKT closes the ring (S10)") {
    val kml =
      """<kml><Document><Placemark><Polygon><outerBoundaryIs><LinearRing>
        |<coordinates>21.0,47.0,0 21.2,47.0,0 21.2,47.2,0 21.0,47.2,0</coordinates>
        |</LinearRing></outerBoundaryIs></Polygon></Placemark></Document></kml>""".stripMargin
    val wkt = Geo.kmlToWkt(kml)
    assert(wkt == "POLYGON((21.0 47.0, 21.2 47.0, 21.2 47.2, 21.0 47.2, 21.0 47.0))")
    assert(Geo.wktIntersects(wkt, quad(21.05, 47.05, 0.01)))
    assert(!Geo.wktIntersects(wkt, quad(30, 30, 1)))
  }
}
