package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** RectBounder protocols (rect_bounder_test.go): vertex-attained and
  * edge-interior-attained latitude extremes, pole-crossing edges, and
  * the random near-pole/near-equator maximum-latitude accuracy fuzz.
  */
class RectBounderProtocolSpec extends AnyFunSuite {

  // Go's machineEpsilon64 = Nextafter(1,2)-1 = 2^-52 (the FULL epsilon)
  private val machineEps = math.ulp(1.0)
  private val rectErrorLat = 10 * machineEps
  private val rectErrorLng = machineEps

  private def v(x: Double, y: Double, z: Double) = Vec3(x, y, z).normalize

  private def boundFor(a: Vec3, b: Vec3): SphereRect = {
    val rb = new RectBounder
    rb.addPoint(a)
    rb.addPoint(b)
    rb.rectBound
  }

  test("latitude extremes attained at vertices (MaxLatitudeSimple)") {
    val cubeLat = math.asin(1 / math.sqrt(3))
    for ((a, b) <- Seq(
      (v(1, 1, 1), v(1, -1, -1)), (v(1, -1, 1), v(1, 1, -1)))) {
      val r = boundFor(a, b)
      assert(math.abs(r.lat.lo + cubeLat) <= rectErrorLat)
      assert(math.abs(r.lat.hi - cubeLat) <= rectErrorLat)
      assert(math.abs(r.lng.lo + math.Pi / 4) <= rectErrorLng)
      assert(math.abs(r.lng.hi - math.Pi / 4) <= rectErrorLng)
    }
  }

  test("latitude extremes attained in the edge interior (EdgeInterior)") {
    def near(a: Double, b: Double) = math.abs(a - b) < 1e-15
    // max latitude, CW and CCW edges
    assert(near(math.Pi / 4 + 0.5 * rectErrorLat,
      boundFor(v(1, 1, 1), v(1, -1, 1)).lat.hi))
    assert(near(math.Pi / 4 + 0.5 * rectErrorLat,
      boundFor(v(1, -1, 1), v(1, 1, 1)).lat.hi))
    // min latitude, CW and CCW edges
    assert(near(-math.Pi / 4 - 0.5 * rectErrorLat,
      boundFor(v(1, -1, -1), v(-1, -1, -1)).lat.lo))
    assert(near(-math.Pi / 4 - 0.5 * rectErrorLat,
      boundFor(v(-1, 1, -1), v(-1, -1, -1)).lat.lo))
    // edges through the poles
    assert(boundFor(v(0.3, 0.4, 1), v(-0.3, -0.4, 1)).lat.hi === math.Pi / 2)
    assert(boundFor(v(0.3, 0.4, -1), v(-0.3, -0.4, -1)).lat.lo === -math.Pi / 2)
  }

  test("maximum latitude accuracy near the equator and pole (Random)") {
    val rng = new scala.util.Random(2020)
    for (_ <- 0 until 100) {
      // frame: U slightly above the equator, V on the equator, W near
      // the north pole
      val u0 = Vec3(rng.nextGaussian(), rng.nextGaussian(), 0).normalize
      val u = Vec3(u0.x, u0.y,
        (machineEps / 2) * 1e-6 * math.pow(1e12, rng.nextDouble())).normalize
      val vAxis = Vec3(0, 0, 1).cross(u).normalize
      val w = u.cross(vAxis).normalize

      val a = (u - vAxis * rng.nextDouble()).normalize
      val b = (u + vAxis * rng.nextDouble()).normalize
      assert(math.abs(LatLng.latitude(u) - boundFor(a, b).lat.hi) <= rectErrorLat,
        "equator-adjacent max latitude")

      val c = (w - vAxis * rng.nextDouble()).normalize
      val d = (w + vAxis * rng.nextDouble()).normalize
      assert(math.abs(LatLng.latitude(w) - boundFor(c, d).lat.hi) <= rectErrorLat,
        "pole-adjacent max latitude")
    }
  }
}
