package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Polyline protocols from polyline_test.go not already covered by
  * GeomOpsSpec: interpolate/uninterpolate goldens with clamping and
  * next-vertex indices, project goldens, and the isOnRight cases
  * including the interior-vertex wedge disambiguation.
  */
class PolylineProtocolSpec extends AnyFunSuite {

  private def pc(x: Double, y: Double, z: Double) = Vec3(x, y, z).normalize

  test("interpolate goldens with clamping and next-vertex (TestPolylineInterpolate)") {
    val vs = Array(pc(1, 0, 0), pc(0, 1, 0), pc(0, 1, 1), pc(0, 0, 1))
    val line = new Polyline(vs)
    val (p0, n0) = line.interpolate(-0.1)
    assert(p0 === vs(0) && n0 === 1)
    val (p1, _) = line.interpolate(0.1)
    assert((p1 - pc(1, math.tan(0.2 * math.Pi / 2.0), 0)).norm < 1e-14)
    val (p2, _) = line.interpolate(0.25)
    assert((p2 - pc(1, 1, 0)).norm < 1e-14)
    val (p3, _) = line.interpolate(0.5)
    assert(p3 === vs(1))
    val (p4, n4) = line.interpolate(0.75)
    assert((p4 - vs(2)).norm < 1e-14 && n4 === 3)
    val (p5, n5) = line.interpolate(1.1)
    assert(p5 === vs(3) && n5 === 4)
  }

  test("uninterpolate inverts interpolate (TestPolylineUninterpolate)") {
    val single = new Polyline(Array(pc(1, 0, 0)))
    assert(single.uninterpolate(pc(0, 1, 0), 1) === 0.0)
    val line = new Polyline(Array(
      pc(1, 0, 0), pc(0, 1, 0), pc(0, 1, 1), pc(0, 0, 1)))
    for (t <- Seq(-0.1, 0.0, 0.5, 0.75, 1.1)) {
      val (p, next) = line.interpolate(t)
      val want = math.max(0.0, math.min(1.0, t))
      assert(math.abs(line.uninterpolate(p, next) - want) < 1e-14,
        s"uninterpolate at $t")
    }
  }

  test("project goldens (TestProject)") {
    val line = Polyline.fromLatLngsDegrees(
      Seq((0, 0), (0, 1), (0, 2), (1, 2)))
    val cases = Seq(
      ((0.5, -0.5), (0.0, 0.0), 1),
      ((0.5, 0.5), (0.0, 0.5), 1),
      ((0.5, 1.0), (0.0, 1.0), 2),
      ((-0.5, 2.5), (0.0, 2.0), 3),
      ((2.0, 2.0), (1.0, 2.0), 4),
      ((-50.0, 0.5), (0.0, 0.5), 1))
    for ((((la, ln), (wla, wln), wantNext), i) <- cases.zipWithIndex) {
      val (proj, next) = line.project(LatLng.toPointDegrees(la, ln))
      assert((proj - LatLng.toPointDegrees(wla, wln)).norm < 1e-14, s"case $i")
      assert(next === wantNext, s"case $i next")
    }
  }

  test("isOnRight incl. interior-vertex wedge cases (TestIsOnRight)") {
    val line1 = Polyline.fromLatLngsDegrees(
      Seq((0, 0), (0, 1), (0, 2), (1, 2)))
    val line2 = Polyline.fromLatLngsDegrees(Seq((0, 0), (0, 1), (-1, 0)))
    val cases = Seq(
      (line1, (-0.5, 0.5), true), (line1, (0.5, -0.5), false),
      (line1, (0.5, 0.5), false), (line1, (0.5, 1.0), false),
      (line1, (-0.5, 2.5), true), (line1, (1.5, 2.5), true),
      // closest point is an interior vertex on different sides of its
      // two incident edges
      (line2, (-0.5, 5.0), false), (line2, (5.5, 5.0), false))
    for (((l, (la, ln), want), i) <- cases.zipWithIndex)
      assert(l.isOnRight(LatLng.toPointDegrees(la, ln)) === want, s"case $i")
  }
}
