package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** SphereRect algebra protocols from rect_test.go: the full IntervalOps
  * truth table (contains/intersects with union/intersection consistency
  * identities), PolarClosure goldens, and CapBound goldens including the
  * wide-rect polar-cap case.
  */
class RectAlgebraSpec extends AnyFunSuite {

  private def r(latLo: Double, lngLo: Double, latHi: Double, lngHi: Double) =
    SphereRect.fromDegrees(latLo, lngLo, latHi, lngHi)

  private def approxEq(a: SphereRect, b: SphereRect, eps: Double = 1e-15): Boolean =
    (a.isEmpty && b.isEmpty) ||
      (math.abs(a.lat.lo - b.lat.lo) <= eps && math.abs(a.lat.hi - b.lat.hi) <= eps &&
        math.abs(a.lng.lo - b.lng.lo) <= eps && math.abs(a.lng.hi - b.lng.hi) <= eps)

  test("interval ops truth table (rect_test.go TestRectIntervalOps)") {
    val quarter = r(0, -180, 90, 0)
    val cases = Seq(
      (quarter, r(45, -90, 45, -90), true, true,
        quarter, r(45, -90, 45, -90)),
      (quarter, r(0, -180, 0, -180), true, true,
        quarter, r(0, -180, 0, -180)),
      (quarter, r(90, 0, 90, 0), true, true, quarter, r(90, 0, 90, 0)),
      (quarter, r(-10, -1, 1, 20), false, true,
        r(-10, 180, 90, 20), r(0, -1, 1, 0)),
      (quarter, r(-10, -1, 0, 20), false, true,
        r(-10, 180, 90, 20), r(0, -1, 0, 0)),
      (quarter, r(-10, 0, 1, 20), false, true,
        r(-10, 180, 90, 20), r(0, 0, 1, 0)),
      (r(-15, -160, -15, -150), r(20, 145, 25, 155), false, false,
        r(-15, 145, 25, -150), SphereRect.empty),
      (r(70, -10, 90, -140), r(60, 175, 80, 5), false, true,
        r(60, -180, 90, 180), r(70, 175, 80, 5)),
      // overlap in latitude but not longitude, and vice versa: the
      // intersection must still be valid (empty)
      (r(12, 30, 60, 60), r(0, 0, 30, 18), false, false,
        r(0, 0, 60, 60), SphereRect.empty),
      (r(0, 0, 18, 42), r(30, 12, 42, 60), false, false,
        r(0, 0, 42, 60), SphereRect.empty))
    for (((a, b, contains, intersects, union, inter), i) <- cases.zipWithIndex) {
      assert(a.containsRect(b) === contains, s"case $i contains")
      assert(a.intersects(b) === intersects, s"case $i intersects")
      assert(approxEq(a.union(b), union), s"case $i union: ${a.union(b)}")
      assert(approxEq(a.intersection(b), inter),
        s"case $i intersection: ${a.intersection(b)}")
      // identities from the reference's loop body
      assert((a.union(b) == a) === a.containsRect(b), s"case $i union identity")
      assert(a.intersection(b).isEmpty === !a.intersects(b),
        s"case $i intersection identity")
    }
  }

  test("polar closure goldens (rect_test.go TestRectPolarClosure)") {
    assert(approxEq(r(-89, 0, 89, 1).polarClosure, r(-89, 0, 89, 1)))
    assert(approxEq(r(-90, -30, -45, 100).polarClosure, r(-90, -180, -45, 180)))
    assert(approxEq(r(89, 145, 90, 146).polarClosure, r(89, -180, 90, 180)))
    assert(r(-90, -145, 90, -144).polarClosure.isFull)
  }

  test("cap bound goldens (rect_test.go TestRectCapBound)") {
    def capApprox(got: Cap, centerWant: Vec3, radiusRadWant: Double): Unit = {
      assert((got.center - centerWant).norm < 1e-14, s"center ${got.center}")
      val wantChord2 = {
        val s = math.sin(radiusRadWant / 2); 4 * s * s
      }
      assert(math.abs(got.radius - wantChord2) < 1e-13, s"radius ${got.radius}")
    }
    // bounding cap at center is smaller: height 0.5 => chord2 = 2*h = 1
    val c1 = RectRegion(r(-45, -45, 45, 45)).capBound
    assert((c1.center - Vec3(1, 0, 0)).norm < 1e-14)
    assert(math.abs(c1.radius - 1.0) < 1e-13)
    // bounding cap at the north pole is smaller
    capApprox(RectRegion(r(88, -80, 89, 80)).capBound,
      Vec3(0, 0, 1), math.toRadians(2))
    // longitude span > 180: polar cap
    capApprox(RectRegion(r(-30, -150, -10, 50)).capBound,
      Vec3(0, 0, -1), math.toRadians(80))
    // wide in both axes: the polar cap is correct even though it is
    // larger than the midpoint cap (which would not contain (-34, 49))
    capApprox(RectRegion(r(-60, -150, 70, 50)).capBound,
      Vec3(0, 0, 1), math.toRadians(150))
  }
}
