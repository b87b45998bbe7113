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
}
