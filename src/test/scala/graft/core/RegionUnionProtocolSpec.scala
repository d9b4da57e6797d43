package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** RegionUnion protocols from regionunion_test.go (two antipodal-ish
  * point regions): bounds, face-cell relations, point containment, and
  * the maxCells=1 covering collapsing to face 0.
  */
class RegionUnionProtocolSpec extends AnyFunSuite {

  private val twoPoints = RegionUnion(Seq(
    Cap.fromPoint(LatLng.toPointDegrees(35, 40)),
    Cap.fromPoint(LatLng.toPointDegrees(-35, -40))))
  private val face0 = Cell.fromId(CellId.fromFace(0))

  test("empty union has empty bounds") {
    val empty = RegionUnion(Seq.empty)
    assert(empty.capBound.isEmpty)
    assert(empty.rectBound.isEmpty)
  }

  test("two points: rect bound spans both") {
    val r = twoPoints.rectBound
    assert(math.abs(math.toDegrees(r.lat.lo) + 35) < 1e-12)
    assert(math.abs(math.toDegrees(r.lat.hi) - 35) < 1e-12)
    assert(math.abs(math.toDegrees(r.lng.lo) + 40) < 1e-12)
    assert(math.abs(math.toDegrees(r.lng.hi) - 40) < 1e-12)
  }

  test("two points: intersects but does not contain face 0") {
    assert(twoPoints.intersectsCell(face0))
    assert(!twoPoints.containsCell(face0))
  }

  test("two points: contains exactly its members") {
    assert(twoPoints.containsPoint(LatLng.toPointDegrees(35, 40)))
    assert(twoPoints.containsPoint(LatLng.toPointDegrees(-35, -40)))
    assert(!twoPoints.containsPoint(LatLng.toPointDegrees(0, 0)))
  }

  test("maxCells=1 covering collapses to face 0") {
    val cov = RegionCoverer(maxCells = 1).covering(twoPoints)
    assert(cov.size === 1)
    assert(cov.ids(0) === CellId.fromFace(0))
  }
}
