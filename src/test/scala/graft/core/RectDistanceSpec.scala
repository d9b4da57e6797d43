package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Rect distance + directed Hausdorff distance, verified with the
  * reference's sampling protocol (rect_test.go:958-1120).
  */
class RectDistanceSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(555)

  private def randLatLng(): (Double, Double) = {
    val p = Vec3(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian()).normalize
    (LatLng.latitude(p), LatLng.longitude(p))
  }

  private def rectFrom2(a: (Double, Double), b: (Double, Double)): SphereRect =
    SphereRect(R1Interval.fromPoint(a._1), S1Interval(a._2, a._2))
      .addPoint(b._1, b._2)

  private def rectDeg(latLo: Double, lngLo: Double, latHi: Double, lngHi: Double) =
    SphereRect.fromDegrees(latLo, lngLo, latHi, lngHi)

  /** The reference's verification: sample rect a on a grid; the directed
    * Hausdorff distance must dominate every sample's distance to b and
    * not exceed the sampled max by more than the grid resolution.
    */
  private def verifyDirectedHausdorff(a: SphereRect, b: SphereRect): Unit = {
    val resolution = 0.1
    val nLat = (a.lat.length / resolution).toInt + 1
    val nLng = (a.lng.length / resolution).toInt + 1
    val dLat = a.lat.length / nLat
    val dLng = a.lng.length / nLng
    var maxDistance = 0.0
    var i = 0
    while (i <= nLng) {
      val lng = a.lng.lo + i * dLng
      var j = 0
      while (j <= nLat) {
        val lat = a.lat.lo + j * dLat
        val lngNorm = math.IEEEremainder(lng, 2 * math.Pi)
        maxDistance = math.max(maxDistance, b.distanceToLatLng(lat, lngNorm))
        j += 1
      }
      i += 1
    }
    val got = a.directedHausdorffDistance(b)
    assert(got >= maxDistance - 1e-10, s"hausdorff($a, $b) = $got < sampled $maxDistance")
    assert(got <= maxDistance + resolution, s"hausdorff($a, $b) = $got >> sampled $maxDistance")
  }

  test("distance to lat/lng matches sampled boundary (random pairs)") {
    for (_ <- 0 until 2000) {
      val r = rectFrom2(randLatLng(), randLatLng())
      val (lat, lng) = randLatLng()
      val got = r.distanceToLatLng(lat, lng)
      if (r.containsLatLng(lat, lng)) {
        assert(got === 0.0)
      } else {
        assert(got > 0)
        // sampled boundary distance brackets the exact answer
        val p = LatLng.toPoint(lat, lng)
        var sampled = Double.MaxValue
        val n = 200
        for (k <- 0 to n) {
          val t = k.toDouble / n
          val lngK = r.lng.lo + t * r.lng.length
          val latK = r.lat.lo + t * r.lat.length
          for ((la, ln) <- Seq((r.lat.lo, lngK), (r.lat.hi, lngK),
            (latK, r.lng.lo), (latK, r.lng.hi))) {
            sampled = math.min(sampled,
              p.angle(LatLng.toPoint(la, math.IEEEremainder(ln, 2 * math.Pi))))
          }
        }
        val spacing = math.max(r.lat.length, r.lng.length) / n
        assert(got <= sampled + 1e-12, s"exact $got above sampled $sampled")
        assert(got >= sampled - spacing, s"exact $got far below sampled $sampled")
      }
    }
  }

  test("directed Hausdorff: random pairs incl. complements (rect_test.go:996)") {
    for (_ <- 0 until 150) {
      val a = rectFrom2(randLatLng(), randLatLng())
      val b = rectFrom2(randLatLng(), randLatLng())
      val a2 = SphereRect(a.lat, a.lng.complement)
      val b2 = SphereRect(b.lat, b.lng.complement)
      verifyDirectedHausdorff(a, b)
      verifyDirectedHausdorff(a2, b)
      verifyDirectedHausdorff(a, b2)
      verifyDirectedHausdorff(a2, b2)
    }
  }

  test("directed Hausdorff: containment gives zero (rect_test.go:1017)") {
    val a = rectDeg(-10, 20, -5, 90)
    for (b <- Seq(rectDeg(-10, 20, -5, 90), rectDeg(-10, 19, -5, 91),
      rectDeg(-11, 20, -4, 90), rectDeg(-11, 19, -4, 91))) {
      assert(a.directedHausdorffDistance(b) === 0.0)
    }
  }

  test("directed Hausdorff: degenerate cases (rect_test.go:1087)") {
    verifyDirectedHausdorff(rectDeg(0, 10, 90, 20), rectDeg(-4, -10, 4, 0))
    verifyDirectedHausdorff(rectDeg(-4, -10, 4, 0), rectDeg(0, 10, 90, 20))
    val a = rectDeg(-50, -10, 50, 10)
    val b = rectDeg(30, -10, 60, 10)
    verifyDirectedHausdorff(a, b)
    verifyDirectedHausdorff(SphereRect(a.lat, a.lng.complement), b)
    verifyDirectedHausdorff(rectDeg(10, 170, 30, 180), rectDeg(-50, -10, 50, 10))
    verifyDirectedHausdorff(rectDeg(10, -180, 30, -170), rectDeg(-50, -10, 50, 10))
    verifyDirectedHausdorff(rectDeg(-30, 170, 30, 180), rectDeg(-10, -90, 10, 90))
    verifyDirectedHausdorff(rectDeg(-30, -180, 30, -170), rectDeg(-10, -90, 10, 90))
    verifyDirectedHausdorff(rectDeg(-20, 105, 20, 110), rectDeg(-30, 5, 30, 15))
    verifyDirectedHausdorff(rectDeg(-20, 95, 20, 105), rectDeg(-30, 5, 30, 15))
  }

  test("point-to-rect Hausdorff equals rect distance (rect_test.go:1036)") {
    for ((lat, lng) <- Seq((5.0, 8.0), (90.0, 10.0));
         b <- Seq(rectDeg(-85, -50, -80, 10), rectDeg(4, -10, 80, 10),
           rectDeg(70, 170, 80, -170))) {
      val a = SphereRect.fromLatLng(lat * LatLng.DegToRad, lng * LatLng.DegToRad)
      val got = a.directedHausdorffDistance(b)
      val want = b.distanceToLatLng(lat * LatLng.DegToRad, lng * LatLng.DegToRad)
      assert(math.abs(got - want) < 1e-12, s"($lat,$lng) vs $b: $got != $want")
    }
  }
}
