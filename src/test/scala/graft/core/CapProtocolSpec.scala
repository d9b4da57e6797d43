package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Cap algebra protocols from cap_test.go: containment truth tables,
  * point containment at tiny/concave extremes, expand, addPoint goldens,
  * and the rect-bound goldens including pole-touching caps.
  */
class CapProtocolSpec extends AnyFunSuite {

  private val tinyRad = 1e-10
  private val xAxisPt = Vec3(1, 0, 0)
  private val yAxisPt = Vec3(0, 1, 0)
  private val xAxis = Cap.fromPoint(xAxisPt)
  private val yAxis = Cap.fromPoint(yAxisPt)
  private val xComp = xAxis.complement
  private val hemi = Cap.fromCenterHeight(Vec3(1, 0, 1).normalize, 1)
  private val tiny = capFromAngle(Vec3(1, 2, 3).normalize, tinyRad)
  private val concave = capFromAngle(
    LatLng.toPointDegrees(80, 10), math.toRadians(150))

  private def capFromAngle(center: Vec3, rad: Double): Cap = {
    val s = math.sin(rad / 2)
    Cap(center, 4 * s * s)
  }

  private def approxEqual(a: Cap, b: Cap, eps: Double = 1e-14): Boolean =
    (a.center - b.center).norm < eps && math.abs(a.radius - b.radius) < 1e-12

  test("empty/full/complement basics (TestCapBasicEmptyFullValid)") {
    assert(Cap.empty.isEmpty && !Cap.empty.isFull)
    assert(Cap.empty.complement.isFull)
    assert(Cap.full.isFull && !Cap.full.isEmpty)
    assert(Cap.full.complement.isEmpty)
    assert(xComp.isFull) // complement of a point cap is full
    assert(xComp.complement.isEmpty)
    assert(!tiny.isEmpty && !tiny.isFull)
  }

  test("cap contains cap truth table (TestCapContains)") {
    val eps = 1e-14
    val cases = Seq(
      (Cap.empty, Cap.empty, true), (Cap.full, Cap.empty, true),
      (Cap.full, Cap.full, true), (Cap.empty, xAxis, false),
      (Cap.full, xAxis, true), (xAxis, Cap.full, false),
      (xAxis, xAxis, true), (xAxis, Cap.empty, true),
      (hemi, tiny, true),
      (hemi, capFromAngle(xAxisPt, math.Pi / 4 - eps), true),
      (hemi, capFromAngle(xAxisPt, math.Pi / 4 + eps), false),
      (concave, hemi, true),
      (concave, Cap.fromCenterHeight(concave.center * -1.0, 0.1), false))
    for (((a, b, want), i) <- cases.zipWithIndex)
      assert(a.containsCap(b) === want, s"case $i")
  }

  test("cap contains point at tiny radii (TestCapContainsPoint)") {
    val tangent = tiny.center.cross(Vec3(3, 2, 1)).normalize
    assert(xAxis.containsPoint(xAxisPt))
    assert(!xAxis.containsPoint(Vec3(1, 1e-20, 0)))
    assert(!yAxis.containsPoint(xAxis.center))
    assert(xComp.containsPoint(xAxis.center))
    assert(!xComp.complement.containsPoint(xAxis.center))
    assert(tiny.containsPoint((tiny.center + tangent * (tinyRad * 0.99)).normalize))
    assert(!tiny.containsPoint((tiny.center + tangent * (tinyRad * 1.01)).normalize))
    assert(hemi.containsPoint(Vec3(1, 0, -(1 - 1e-14)).normalize))
  }

  test("expand goldens (TestCapExpanded)") {
    val cap50 = capFromAngle(xAxisPt, math.toRadians(50))
    val cap51 = capFromAngle(xAxisPt, math.toRadians(51))
    assert(Cap.empty.expanded(2.0).isEmpty)
    assert(Cap.full.expanded(2.0).isFull)
    assert(approxEqual(cap50.expanded(0), cap50))
    assert(approxEqual(cap50.expanded(math.toRadians(1)), cap51, 1e-12))
    assert(!cap50.expanded(math.toRadians(129.99)).isFull)
    assert(cap50.expanded(math.toRadians(130.01)).isFull)
  }

  test("addPoint goldens (TestCapAddPoint)") {
    assert(approxEqual(xAxis.addPoint(xAxisPt), xAxis))
    assert(xAxis.addPoint(Vec3(-1, 0, 0)).isFull)
    assert(approxEqual(xAxis.addPoint(Vec3(0, 0, 1)),
      capFromAngle(xAxisPt, math.Pi / 2), 1e-7))
    assert(approxEqual(hemi.addPoint(Vec3(0, 1, -1).normalize),
      capFromAngle(Vec3(1, 0, 1).normalize, math.toRadians(120)), 1e-7))
    assert(approxEqual(hemi.addPoint(Vec3(-1, -1, -1).normalize),
      capFromAngle(Vec3(1, 0, 1).normalize,
        math.acos(-math.sqrt(2.0 / 3.0))), 1e-7))
    assert(approxEqual(hemi.addPoint(Vec3(0, 1, 1).normalize), hemi))
    assert(approxEqual(hemi.addPoint(Vec3(1, 0, 0)), hemi))
  }

  test("rect bound goldens incl. pole-touching caps (TestCapRectBounds)") {
    val eps = 1e-13
    def check(c: Cap, latLo: Double, latHi: Double,
              lngLo: Double, lngHi: Double, fullLng: Boolean): Unit = {
      val r = c.rectBound
      assert(math.abs(math.toDegrees(r.lat.lo) - latLo) < eps, s"lat.lo of $c")
      assert(math.abs(math.toDegrees(r.lat.hi) - latHi) < eps, s"lat.hi of $c")
      if (fullLng) assert(r.lng.isFull, s"lng of $c should be full")
      else {
        assert(math.abs(math.toDegrees(r.lng.lo) - lngLo) < eps, s"lng.lo of $c")
        assert(math.abs(math.toDegrees(r.lng.hi) - lngHi) < eps, s"lng.hi of $c")
      }
    }
    check(capFromAngle(LatLng.toPointDegrees(-45, 57), math.toRadians(50)),
      -90, 5, -180, 180, fullLng = true)
    check(capFromAngle(Vec3(1, 0, 1).normalize, math.Pi / 4 + 1e-16),
      0, 90, -180, 180, fullLng = true)
    check(capFromAngle(Vec3(1, 0, 1).normalize, math.toRadians(45 + 5e-15)),
      0, 90, -180, 180, fullLng = true)
    check(capFromAngle(Vec3(0, 1, 0), math.Pi / 2 + 2e-16),
      -90, 90, -180, 180, fullLng = true)
    check(capFromAngle(LatLng.toPointDegrees(0, 50), math.toRadians(20)),
      -20, 20, 30, 70, fullLng = false)
    check(capFromAngle(LatLng.toPointDegrees(90, 123), math.toRadians(10)),
      80, 90, -180, 180, fullLng = true)
  }
}
