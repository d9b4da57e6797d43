package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Intersection construction and edge-pair distances, property-tested
  * with the reference's own protocol (edge_crossings_test.go
  * TestEdgeutilIntersectionError; edge_distances_test.go edge-pair cases).
  */
class EdgeIntersectionSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(987654)

  private def randPoint(): Vec3 =
    Vec3(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian()).normalize

  test("intersection error bounds (TestEdgeutilIntersectionError protocol)") {
    // Edges crossing near p at angles (slopes) log-uniform in
    // [1e-15, 1e15], lengths log-uniform in [1e-15, 1], endpoints often
    // barely past the crossing — exercising both tiers.
    val distanceAbsError = 3 * Predicates.MachineEps
    val intersectionError = EdgeIntersections.IntersectionError
    var iters = 0
    while (iters < 2000) {
      val z = randPoint()
      val d1o = z.ortho
      val d2o = z.cross(d1o)
      val slope = 1e-15 * math.pow(1e30, rng.nextDouble())
      val d1 = d1o
      val d2 = (d1o + d2o * slope).normalize
      val abLen = math.pow(1e-15, rng.nextDouble())
      val cdLen = math.pow(1e-15, rng.nextDouble())
      var aF = math.pow(1e-5, rng.nextDouble()); if (rng.nextBoolean()) aF = 1 - aF
      var cF = math.pow(1e-5, rng.nextDouble()); if (rng.nextBoolean()) cF = 1 - cF
      val a = (z - d1 * (aF * abLen)).normalize
      val b = (z + d1 * ((1 - aF) * abLen)).normalize
      val c = (z - d2 * (cF * cdLen)).normalize
      val d = (z + d2 * ((1 - cF) * cdLen)).normalize
      if (EdgeCrossings.crossingSign(a, b, c, d) == EdgeCrossings.Cross) {
        val actual = EdgeIntersections.intersection(a, b, c, d)
        val distAB = EdgeDistances.distanceFromSegment(actual, a, b)
        val distCD = EdgeDistances.distanceFromSegment(actual, c, d)
        assert(distAB <= intersectionError + distanceAbsError,
          s"distAB $distAB slope $slope lens $abLen/$cdLen")
        assert(distCD <= intersectionError + distanceAbsError,
          s"distCD $distCD slope $slope lens $abLen/$cdLen")
        // result must not depend on edge order or direction
        assert(EdgeIntersections.intersection(c, d, a, b) === actual)
        assert(EdgeIntersections.intersection(b, a, d, c) === actual)
        iters += 1
      }
    }
  }

  test("edge pair min/max distances and closest points are consistent") {
    for (_ <- 0 until 2000) {
      val a0 = randPoint(); val a1 = randPoint()
      val b0 = randPoint(); val b1 = randPoint()
      val min = EdgeDistances.edgePairMinDistance(a0, a1, b0, b1)
      val max = EdgeDistances.edgePairMaxDistance(a0, a1, b0, b1)
      assert(min >= 0 && min <= max + 1e-15)
      val (pa, pb) = EdgeDistances.edgePairClosestPoints(a0, a1, b0, b1)
      if (min == 0) {
        assert(pa === pb)
      } else {
        // closest-point chord distance equals the min distance
        val d = ChordAngle.between(pa, pb)
        assert(math.abs(d - min) <= 1e-12 * (1 + min),
          s"closest pair dist $d vs min $min")
      }
      // brute-force sanity: min <= all four endpoint-to-edge distances
      for (x <- Seq(a0, a1)) {
        assert(min <= ChordAngle.fromRadians(
          EdgeDistances.distanceFromSegment(x, b0, b1)) + 1e-12)
      }
    }
  }

  test("polyline-to-polyline distance: crossing chains give zero") {
    val a = Polyline.fromLatLngsDegrees(Seq((0.0, -10.0), (0.0, 10.0)))
    val b = Polyline.fromLatLngsDegrees(Seq((-10.0, 0.0), (10.0, 0.0)))
    assert(a.distanceToPolyline(b) === 0.0)
    val c = Polyline.fromLatLngsDegrees(Seq((5.0, -10.0), (5.0, 10.0)))
    val d = a.distanceToPolyline(c)
    // 5 degrees apart at the closest approach
    assert(math.abs(ChordAngle.toRadians(d) - 5 * LatLng.DegToRad) < 1e-3)
  }
}
