package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Polygon area/centroid protocols from polygon_test.go: hemisphere and
  * quarter-sphere areas, multi-shell area additivity, shell-minus-hole
  * area, and centroid additivity with exact loop-part arithmetic.
  */
class PolygonProtocolSpec extends AnyFunSuite {

  private def mk(s: String) = Loop.parse(s)
  private val cross1 = mk("-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1")
  private val sideHole = mk("-1.5:0.5, -1.2:0.5, -1.2:-0.5, -1.5:-0.5")
  private val centerHole = mk("-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5")

  test("area goldens: hemispheres and quarter sphere") {
    assert(Polygon.fromLoops(Seq(Loop.empty)).area === 0.0)
    assert(math.abs(Polygon.fromLoops(Seq(Loop.full)).area - 4 * math.Pi) < 1e-12)
    val southHemi = Polygon.fromLoops(Seq(mk("0:-180, 0:60, 0:-60").normalized))
    assert(math.abs(southHemi.area - 2 * math.Pi) < 1e-12)
    val quarter = Polygon.fromLoops(Seq(mk("0:-180, 0:90, -60:90, 0:-90").normalized))
    assert(math.abs(quarter.area - math.Pi) < 1e-12)
  }

  test("two shells: area and centroid are the loop sums (exact)") {
    val poly = Polygon.fromLoops(Seq(sideHole, centerHole))
    // disjoint shells at depth 0 each
    assert(poly.loops.forall(!_.isHole))
    assert(poly.area === sideHole.area + centerHole.area)
    assert(poly.centroid ===
      sideHole.centroidTimesArea + centerHole.centroidTimesArea)
  }

  test("shell with hole: area and centroid are the loop differences (exact)") {
    val poly = Polygon.fromLoops(Seq(cross1, centerHole))
    assert(poly.loops(1).isHole)
    assert(poly.area === cross1.area - centerHole.area)
    assert(poly.centroid ===
      cross1.centroidTimesArea - centerHole.centroidTimesArea)
  }
}
