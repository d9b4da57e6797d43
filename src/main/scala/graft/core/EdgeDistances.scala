package graft.core

/** Point <-> geodesic-edge distances and constructions
  * (/root/reference/s2/edge_distances.go:25-340). All distances are chord
  * angles (squared chord lengths) for cheap comparison.
  */
object EdgeDistances {
  import Predicates.MachineEps
  import EdgeCrossings.pointCross

  /** Shortest chord distance from x to edge ab, assuming the closest point
    * is interior to ab; returns (minDist, false) otherwise
    * (edge_distances.go:234-329).
    */
  def interiorDist(x: Vec3, a: Vec3, b: Vec3, minDist: Double,
                   alwaysUpdate: Boolean): (Double, Boolean) = {
    val xa2 = (x - a).norm2
    val xb2 = (x - b).norm2
    val ab2 = (a - b).norm2
    val maxError = 4.75 * MachineEps * (xa2 + xb2 + ab2) + 8 * MachineEps * MachineEps
    if (math.abs(xa2 - xb2) >= ab2 + maxError) return (minDist, false)

    val c = pointCross(a, b)
    val c2 = c.norm2
    val xDotC = x.dot(c)
    val xDotC2 = xDotC * xDotC
    if (!alwaysUpdate && xDotC2 > c2 * minDist) return (minDist, false)

    val cx = c.cross(x)
    if ((a - x).dot(cx) >= 0 || (b - x).dot(cx) <= 0) return (minDist, false)

    val qr = 1 - math.sqrt(cx.norm2 / c2)
    val dist = (xDotC2 / c2) + qr * qr
    if (!alwaysUpdate && dist >= minDist) (minDist, false)
    else (dist, true)
  }

  /** Min chord distance from x to edge ab with tracking (edge_distances.go:215-228). */
  def updateMinDistance(x: Vec3, a: Vec3, b: Vec3, minDist: Double,
                        alwaysUpdate: Boolean = false): (Double, Boolean) = {
    val (d, ok) = interiorDist(x, a, b, minDist, alwaysUpdate)
    if (ok) return (d, true)
    val dist = math.min((x - a).norm2, (x - b).norm2)
    if (!alwaysUpdate && dist >= minDist) (minDist, false)
    else (dist, true)
  }

  /** Angle (radians) from x to segment ab (edge_distances.go:29-33). */
  def distanceFromSegment(x: Vec3, a: Vec3, b: Vec3): Double = {
    val (ca, _) = updateMinDistance(x, a, b, Double.MaxValue, alwaysUpdate = true)
    ChordAngle.toRadians(ca)
  }

  def isDistanceLess(x: Vec3, a: Vec3, b: Vec3, limitChord2: Double): Boolean =
    updateMinDistance(x, a, b, limitChord2)._2

  /** Max chord distance from x to edge ab (edge_distances.go:60-72). */
  def updateMaxDistance(x: Vec3, a: Vec3, b: Vec3, maxDist: Double): (Double, Boolean) = {
    var dist = math.max(ChordAngle.between(x, a), ChordAngle.between(x, b))
    if (dist > ChordAngle.Right) {
      val (d, _) = updateMinDistance(x * -1, a, b, dist, alwaysUpdate = true)
      dist = ChordAngle.Straight - d
    }
    if (maxDist < dist) (dist, true) else (maxDist, false)
  }

  /** Closest point on edge ab to x (edge_distances.go:92-109). */
  def project(x: Vec3, a: Vec3, b: Vec3): Vec3 = {
    val aXb = pointCross(a, b)
    val p = x - (aXb * (x.dot(aXb) / aXb.norm2))
    if (Predicates.sign(aXb, a, p) && Predicates.sign(p, b, aXb)) p.normalize
    else if ((x - a).norm2 <= (x - b).norm2) a
    else b
  }

  /** Fraction t of x along ab (edge_distances.go:115-119). */
  def distanceFraction(x: Vec3, a: Vec3, b: Vec3): Double = {
    val d0 = x.angle(a)
    val d1 = x.angle(b)
    d0 / (d0 + d1)
  }

  /** Point at fraction t (of the spherical distance) along ab
    * (edge_distances.go:126-137).
    */
  def interpolate(t: Double, a: Vec3, b: Vec3): Vec3 = {
    if (t == 0) return a
    if (t == 1) return b
    interpolateAtDistance(t * a.angle(b), a, b)
  }

  /** Point at angular distance ax from a toward b (edge_distances.go:140-155). */
  def interpolateAtDistance(axRad: Double, a: Vec3, b: Vec3): Vec3 = {
    val normal = pointCross(a, b)
    val tangent = normal.cross(a)
    ((a * math.cos(axRad)) + (tangent * (math.sin(axRad) / tangent.norm))).normalize
  }

  /** Min distance between edge pairs; zero when they cross
    * (edge_distances.go:333-360 semantics).
    */
  def edgePairMinDistance(a0: Vec3, a1: Vec3, b0: Vec3, b1: Vec3): Double = {
    if (EdgeCrossings.crossingSign(a0, a1, b0, b1) == EdgeCrossings.Cross) return 0
    // Otherwise the minimum is vertex-to-opposite-edge.
    var best = ChordAngle.Straight
    best = updateMinDistance(a0, b0, b1, best, alwaysUpdate = true)._1
    best = updateMinDistance(a1, b0, b1, best)._1
    best = updateMinDistance(b0, a0, a1, best)._1
    best = updateMinDistance(b1, a0, a1, best)._1
    best
  }

  /** Max distance between edge pairs; Pi when one edge crosses the
    * antipodal reflection of the other (edge_distances.go:358-377).
    */
  def edgePairMaxDistance(a0: Vec3, a1: Vec3, b0: Vec3, b1: Vec3): Double = {
    if (EdgeCrossings.crossingSign(a0, a1, b0 * -1, b1 * -1) == EdgeCrossings.Cross)
      return ChordAngle.Straight
    var best = 0.0
    best = updateMaxDistance(a0, b0, b1, best)._1
    best = updateMaxDistance(a1, b0, b1, best)._1
    best = updateMaxDistance(b0, a0, a1, best)._1
    best = updateMaxDistance(b1, a0, a1, best)._1
    best
  }

  /** The pair of points (on a0a1, on b0b1) achieving the minimum edge-pair
    * distance; both equal the intersection when the edges cross
    * (edge_distances.go:380-419).
    */
  def edgePairClosestPoints(a0: Vec3, a1: Vec3, b0: Vec3, b1: Vec3): (Vec3, Vec3) = {
    if (EdgeCrossings.crossingSign(a0, a1, b0, b1) == EdgeCrossings.Cross) {
      val x = EdgeIntersections.intersection(a0, a1, b0, b1)
      return (x, x)
    }
    var minDist = updateMinDistance(a0, b0, b1, 0.0, alwaysUpdate = true)._1
    var closestVertex = 0
    locally {
      val (d, ok) = updateMinDistance(a1, b0, b1, minDist)
      if (ok) { minDist = d; closestVertex = 1 }
    }
    locally {
      val (d, ok) = updateMinDistance(b0, a0, a1, minDist)
      if (ok) { minDist = d; closestVertex = 2 }
    }
    locally {
      val (_, ok) = updateMinDistance(b1, a0, a1, minDist)
      if (ok) closestVertex = 3
    }
    closestVertex match {
      case 0 => (a0, project(a0, b0, b1))
      case 1 => (a1, project(a1, b0, b1))
      case 2 => (project(b0, a0, a1), b0)
      case _ => (project(b1, a0, a1), b1)
    }
  }
}
