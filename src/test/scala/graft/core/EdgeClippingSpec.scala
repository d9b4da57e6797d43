package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Edge clipping verified with the reference's own protocols
  * (edge_clipping_test.go): face-segment continuity + angular coverage
  * for clipToPaddedFace/faceSegments, and clip-vs-intersects consistency
  * for the 2D clipping, over adversarial near-cube-edge geometry.
  */
class EdgeClippingSpec extends AnyFunSuite {
  import EdgeClipping._

  private val rng = new scala.util.Random(13579)

  private def randPoint(): Vec3 =
    Vec3(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian()).normalize

  private def logUniform(lo: Double, hi: Double): Double =
    math.exp(math.log(lo) + rng.nextDouble() * (math.log(hi) - math.log(lo)))

  /** edge_clipping_test.go perturbedCornerOrMidpoint. */
  private def perturbedCornerOrMidpoint(p: Vec3, q: Vec3): Vec3 = {
    var a = p * (rng.nextInt(3) - 1).toDouble + q * (rng.nextInt(3) - 1).toDouble
    if (rng.nextInt(10) == 0) a = a + randPoint() * logUniform(1e-300, 1.0)
    else if (rng.nextBoolean()) a = a + randPoint() * (4 * Predicates.MachineEps)
    else a = a + randPoint() * logUniform(1e-25, 1e-10)
    if (a.norm2 < java.lang.Double.MIN_VALUE) perturbedCornerOrMidpoint(p, q)
    else a
  }

  /** Port of testClipToPaddedFace (edge_clipping_test.go:110-247). */
  private def checkClipToPaddedFace(a0: Vec3, b0: Vec3): Unit = {
    val a = a0.normalize
    val b = b0.normalize
    if (a == b * -1) return

    val segments = faceSegments(a, b)
    assert(segments.nonEmpty)
    val n = segments.length
    val errorRadians = FaceClipErrorRadians

    val aPrime = STUV.faceUVToXYZ(segments.head.face, segments.head.aU, segments.head.aV)
    assert(a.angle(aPrime) <= errorRadians, s"first vertex far from A")
    val bPrime = STUV.faceUVToXYZ(segments.last.face, segments.last.bU, segments.last.bV)
    assert(b.angle(bPrime) <= errorRadians, s"last vertex far from B")

    val norm = EdgeCrossings.pointCross(a, b).normalize
    val aTan = norm.cross(a)
    val bTan = b.cross(norm)

    for (i <- segments.indices) {
      val s = segments(i)
      assert(math.abs(s.aU) <= 1 + 1e-15 && math.abs(s.aV) <= 1 + 1e-15)
      assert(math.abs(s.bU) <= 1 + 1e-15 && math.abs(s.bV) <= 1 + 1e-15)
      if (i > 0) {
        val prev = segments(i - 1)
        assert(prev.face != s.face, "adjacent segments share a face")
        val got = STUV.faceUVToXYZ(prev.face, prev.bU, prev.bV)
        val want = STUV.faceUVToXYZ(s.face, s.aU, s.aV)
        assert((got - want).norm < 1e-12, "interior vertices must agree across faces")
        val p = want.normalize
        assert(math.abs(p.dot(norm)) <= errorRadians)
        assert(p.dot(aTan) >= -errorRadians)
        assert(p.dot(bTan) >= -errorRadians)
      }
    }

    val padding =
      if (rng.nextInt(10) == 0) 0.0 else 1e-10 * math.pow(1e-5, rng.nextDouble())
    val xAxis = a
    val yAxis = aTan
    var expected = S1Interval(0, a.angle(b))
    if (expected.isInverted) expected = S1Interval(expected.hi, expected.lo)
    val maxAngles = expected.expanded(FaceClipErrorRadians)
    var actual = S1Interval.empty

    for (face <- 0 until 6) {
      clipToPaddedFace(a, b, face, padding).foreach { case (aU, aV, bU, bV) =>
        val aClip = STUV.faceUVToXYZ(face, aU, aV).normalize
        val bClip = STUV.faceUVToXYZ(face, bU, bV).normalize
        assert(math.abs(aClip.dot(norm)) <= FaceClipErrorRadians)
        assert(math.abs(bClip.dot(norm)) <= FaceClipErrorRadians)
        if (aClip.angle(a) > FaceClipErrorRadians) {
          val largest = math.max(math.abs(aU), math.abs(aV))
          assert(math.abs(largest - (1 + padding)) < 1e-14,
            s"clipped A not on the padded boundary: $largest vs ${1 + padding}")
        }
        if (bClip.angle(b) > FaceClipErrorRadians) {
          val largest = math.max(math.abs(bU), math.abs(bV))
          assert(math.abs(largest - (1 + padding)) < 1e-14,
            s"clipped B not on the padded boundary: $largest vs ${1 + padding}")
        }
        val aAngle = math.atan2(aClip.dot(yAxis), aClip.dot(xAxis))
        val bAngle = math.atan2(bClip.dot(yAxis), bClip.dot(xAxis))
        var faceAngles = S1Interval.fromPointPair(aAngle, bAngle)
        if (faceAngles.isInverted) faceAngles = S1Interval(faceAngles.hi, faceAngles.lo)
        assert(maxAngles.containsInterval(faceAngles),
          s"face $face angles $faceAngles outside $maxAngles")
        actual = actual.union(faceAngles)
      }
    }
    assert(actual.expanded(FaceClipErrorRadians).containsInterval(expected),
      "union of clipped segments must cover the edge")
  }

  test("clipToPaddedFace + faceSegments (reference protocol incl. cube-edge cases)") {
    checkClipToPaddedFace(Vec3(1, -0.5, -0.5), Vec3(1, 0.5, 0.5))
    checkClipToPaddedFace(Vec3(1, 0.5, 0.5), Vec3(1, -0.5, -0.5))
    checkClipToPaddedFace(Vec3(1, 0, 0), Vec3(0, 1, 0))
    checkClipToPaddedFace(Vec3(0, 1, 0), Vec3(1, 0, 0))
    checkClipToPaddedFace(Vec3(0.75, 0, -1), Vec3(0.75, 0, 1))
    checkClipToPaddedFace(Vec3(0.75, 0, 1), Vec3(0.75, 0, -1))
    checkClipToPaddedFace(Vec3(1, 0, 0.75), Vec3(0, 1, 0.75))
    checkClipToPaddedFace(Vec3(0, 1, 0.75), Vec3(1, 0, 0.75))
    checkClipToPaddedFace(Vec3(1, 0.9, 0.95), Vec3(-1, 0.95, 0.9))
    checkClipToPaddedFace(Vec3(-1, 0.95, 0.9), Vec3(1, 0.9, 0.95))

    val corners = Seq((-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0))
    for (_ <- 0 until 700) {
      val face = rng.nextInt(6)
      val i = rng.nextInt(4)
      val j = (i + 1) & 3
      val p = STUV.faceUVToXYZ(face, corners(i)._1, corners(i)._2)
      val q = STUV.faceUVToXYZ(face, corners(j)._1, corners(j)._2)
      checkClipToPaddedFace(perturbedCornerOrMidpoint(p, q),
        perturbedCornerOrMidpoint(p, q))
    }
  }

  private def pointFromInterval(lo: Double, hi: Double): Double = {
    if (rng.nextInt(5) == 0) {
      if (rng.nextBoolean()) lo - logUniform(1e-16, 1.0)
      else hi + logUniform(1e-16, 1.0)
    } else if (rng.nextInt(3) == 0) { if (rng.nextBoolean()) lo else hi }
    else lo + rng.nextDouble() * (hi - lo)
  }

  test("clipEdge vs edgeIntersectsRect consistency (reference protocol)") {
    val errorDist = EdgeClipErrorUVDist + IntersectsRectErrorUVDist
    def randRect(): (Double, Double, Double, Double) = {
      val x1 = rng.nextDouble() * 2 - 1; val x2 = rng.nextDouble() * 2 - 1
      val y1 = rng.nextDouble() * 2 - 1; val y2 = rng.nextDouble() * 2 - 1
      (math.min(x1, x2), math.max(x1, x2), math.min(y1, y2), math.max(y1, y2))
    }
    val rects = Seq.fill(5)(randRect()) ++ Seq(
      (-0.7, -0.7, 0.3, 0.35), (0.2, 0.5, 0.3, 0.3),
      (-0.7, 0.3, 0.0, 0.0), (0.3, 0.3, 0.8, 0.8))
    for ((xLo, xHi, yLo, yHi) <- rects; _ <- 0 until 700) {
      val ax = pointFromInterval(xLo, xHi); val ay = pointFromInterval(yLo, yHi)
      val bx = pointFromInterval(xLo, xHi); val by = pointFromInterval(yLo, yHi)
      clipEdge(ax, ay, bx, by, (xLo, xHi), (yLo, yHi)) match {
        case None =>
          // shrunk rect must not intersect
          assert(!edgeIntersectsRect(ax, ay, bx, by,
            xLo + errorDist, xHi - errorDist, yLo + errorDist, yHi - errorDist) ||
            xHi - xLo < 2 * errorDist || yHi - yLo < 2 * errorDist)
        case Some((cax, cay, cbx, cby)) =>
          assert(edgeIntersectsRect(ax, ay, bx, by,
            xLo - errorDist, xHi + errorDist, yLo - errorDist, yHi + errorDist))
          // clipped points inside the (slightly expanded) rect
          for ((px, py) <- Seq((cax, cay), (cbx, cby))) {
            assert(px >= xLo - errorDist && px <= xHi + errorDist)
            assert(py >= yLo - errorDist && py <= yHi + errorDist)
            // and on the line AB within errorDist
            val dx = bx - ax; val dy = by - ay
            val len = math.sqrt(dx * dx + dy * dy)
            if (len > 0) {
              val cross = math.abs((px - ax) * dy - (py - ay) * dx) / len
              assert(cross <= errorDist, s"clipped point off the line by $cross")
            }
          }
      }
    }
  }
}
