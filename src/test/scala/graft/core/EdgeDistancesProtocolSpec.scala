package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Edge distance protocols from edge_distances_test.go: the full
  * CheckDistance golden table (distance + closest point incl. degenerate
  * edges and antipodal queries), the CheckMaxDistance table, antipodal
  * interpolation, and unit-length stability under repeated
  * interpolation.
  */
class EdgeDistancesProtocolSpec extends AnyFunSuite {

  private def v(x: Double, y: Double, z: Double) = Vec3(x, y, z).normalize

  test("distance + closest point goldens (TestEdgeDistancesCheckDistance)") {
    val cases = Seq(
      (v(1, 0, 0), v(1, 0, 0), v(0, 1, 0), 0.0, v(1, 0, 0)),
      (v(0, 1, 0), v(1, 0, 0), v(0, 1, 0), 0.0, v(0, 1, 0)),
      (v(1, 3, 0), v(1, 0, 0), v(0, 1, 0), 0.0, v(1, 3, 0)),
      (v(0, 0, 1), v(1, 0, 0), v(0, 1, 0), math.Pi / 2, v(1, 0, 0)),
      (v(0, 0, -1), v(1, 0, 0), v(0, 1, 0), math.Pi / 2, v(1, 0, 0)),
      (v(-1, -1, 0), v(1, 0, 0), v(0, 1, 0), 0.75 * math.Pi, v(1, 0, 0)),
      (v(0, 1, 0), v(1, 0, 0), v(1, 1, 0), math.Pi / 4, v(1, 1, 0)),
      (v(0, -1, 0), v(1, 0, 0), v(1, 1, 0), math.Pi / 2, v(1, 0, 0)),
      (v(0, -1, 0), v(1, 0, 0), v(-1, 1, 0), math.Pi / 2, v(1, 0, 0)),
      (v(-1, -1, 0), v(1, 0, 0), v(-1, 1, 0), math.Pi / 2, v(-1, 1, 0)),
      (v(1, 1, 1), v(1, 0, 0), v(0, 1, 0),
        math.asin(math.sqrt(1.0 / 3.0)), v(1, 1, 0)),
      (v(1, 1, -1), v(1, 0, 0), v(0, 1, 0),
        math.asin(math.sqrt(1.0 / 3.0)), v(1, 1, 0)),
      (v(-1, 0, 0), v(1, 1, 0), v(1, 1, 0), 0.75 * math.Pi, v(1, 1, 0)),
      (v(0, 0, -1), v(1, 1, 0), v(1, 1, 0), math.Pi / 2, v(1, 1, 0)),
      (v(-1, 0, 0), v(1, 0, 0), v(1, 0, 0), math.Pi, v(1, 0, 0)))
    for (((x, a, b, wantDist, wantClosest), i) <- cases.zipWithIndex) {
      val got = EdgeDistances.distanceFromSegment(x, a, b)
      assert(math.abs(got - wantDist) < 1e-14, s"case $i distance: $got")
      val closest = EdgeDistances.project(x, a, b)
      assert((closest - wantClosest).norm < 1e-14, s"case $i closest: $closest")
    }
  }

  test("max distance goldens (TestEdgeDistancesCheckMaxDistance)") {
    val cases = Seq(
      (v(1, 0, 1), v(1, 0, 0), v(0, 1, 0), math.Pi / 2),
      (v(1, 0, -1), v(1, 0, 0), v(0, 1, 0), math.Pi / 2),
      (v(0, 1, 1), v(1, 0, 0), v(0, 1, 0), math.Pi / 2),
      (v(0, 1, -1), v(1, 0, 0), v(0, 1, 0), math.Pi / 2),
      (v(1, 1, 1), v(1, 0, 0), v(0, 1, 0), math.asin(math.sqrt(2.0 / 3))),
      (v(1, 1, -1), v(1, 0, 0), v(0, 1, 0), math.asin(math.sqrt(2.0 / 3))),
      (v(1, 0, 0), v(1, 1, 0), v(1, -1, 0), math.Pi / 4),
      (v(0, 1, 0), v(1, 1, 0), v(1, 1, 0), math.Pi / 4),
      (v(0, 0, 1), v(0, 1, 1), v(0, -1, 1), math.Pi / 4),
      (v(0, 0, 1), v(1, 0, 0), v(1, 0, -1), 3 * math.Pi / 4))
    for (((x, a, b, wantDist), i) <- cases.zipWithIndex) {
      val (chord2, _) = EdgeDistances.updateMaxDistance(x, a, b, -1.0)
      val gotRad = ChordAngle.toRadians(chord2)
      assert(math.abs(gotRad - wantDist) < 1e-14, s"case $i: $gotRad")
    }
  }

  test("interpolation on an antipodal edge (TestEdgeDistancesInterpolateAntipodal)") {
    val p1 = v(0.1, 1e-30, 0.3)
    var dist = 0.0
    while (dist <= 1.0) {
      val actual = EdgeDistances.interpolate(dist, p1, p1 * -1)
      assert(math.abs(actual.angle(p1) - dist * math.Pi) < 3e-15,
        s"antipodal interpolate at $dist")
      dist += 0.125
    }
  }

  test("repeated interpolation stays unit length") {
    val rng = new scala.util.Random(1414)
    for (_ <- 0 until 30) {
      var a = Vec3(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian()).normalize
      val b = Vec3(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian()).normalize
      for (_ <- 0 until 1000) a = EdgeDistances.interpolate(0.01, a, b)
      assert(math.abs(a.norm - 1.0) < 1e-14)
    }
  }
}
