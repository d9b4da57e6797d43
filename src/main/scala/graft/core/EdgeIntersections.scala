package graft.core

/** Robust intersection point of two crossing edges
  * (/root/reference/s2/edge_crossings.go:172-409): the stable tier
  * projects and interpolates with cancellation-minimizing differences;
  * when its error bound fails, the exact tier recomputes the normals'
  * cross product in exact arithmetic (BigDecimal products/sums of
  * doubles are exact, like the reference's big.Float vectors).
  */
object EdgeIntersections {
  /** Rounding epsilon for float64 (predicates.go:96-106). */
  private val TErr = math.pow(2, -53)
  private val UnitRoundoff64 = TErr

  /** Guaranteed bound on the returned point's angular error
    * (edge_crossings.go:32).
    */
  val IntersectionError: Double = 8 * UnitRoundoff64

  private def cmp(a: Vec3, b: Vec3): Int = {
    if (a.x != b.x) return if (a.x < b.x) -1 else 1
    if (a.y != b.y) return if (a.y < b.y) -1 else 1
    if (a.z != b.z) return if (a.z < b.z) -1 else 1
    0
  }

  /** Projection of x onto aNorm with an error bound, computed from the
    * nearer edge endpoint to minimize cancellation
    * (edge_crossings.go:228-262).
    */
  private def projection(x: Vec3, aNorm: Vec3, aNormLen: Double,
                         a0: Vec3, a1: Vec3): (Double, Double) = {
    val x0 = x - a0
    val x1 = x - a1
    val x0d2 = x0.norm2
    val x1d2 = x1.norm2
    var dist = 0.0
    var proj = 0.0
    if (x0d2 < x1d2 || (x0d2 == x1d2 && cmp(x0, x1) == -1)) {
      dist = math.sqrt(x0d2)
      proj = x0.dot(aNorm)
    } else {
      dist = math.sqrt(x1d2)
      proj = x1.dot(aNorm)
    }
    val bound = (((3.5 + 2 * math.sqrt(3)) * aNormLen +
      32 * math.sqrt(3) * UnitRoundoff64) * dist + 1.5 * math.abs(proj)) * TErr
    (proj, bound)
  }

  private def compareEdges(a0v: Vec3, a1v: Vec3, b0v: Vec3, b1v: Vec3): Boolean = {
    var a0 = a0v; var a1 = a1v; var b0 = b0v; var b1 = b1v
    if (cmp(a0, a1) != -1) { val t = a0; a0 = a1; a1 = t }
    if (cmp(b0, b1) != -1) { val t = b0; b0 = b1; b1 = t }
    cmp(a0, b0) == -1 || (a0 == b0 && cmp(b0, b1) == -1)
  }

  private def intersectionStableSorted(a0: Vec3, a1: Vec3,
                                       b0: Vec3, b1: Vec3): Option[Vec3] = {
    val aNorm = (a0 - a1).cross(a0 + a1)
    val aNormLen = aNorm.norm
    val bLen = (b1 - b0).norm

    val (b0Dist, b0Error) = projection(b0, aNorm, aNormLen, a0, a1)
    val (b1Dist, b1Error) = projection(b1, aNorm, aNormLen, a0, a1)

    val distSum = math.abs(b0Dist - b1Dist)
    val errorSum = b0Error + b1Error
    if (distSum <= errorSum) return None // error unbounded

    val x = (b1 * b0Dist) - (b0 * b1Dist)
    val err = bLen * math.abs(b0Dist * b1Error - b1Dist * b0Error) /
      (distSum - errorSum) + 2 * distSum * TErr

    val xLen = x.norm
    if (err > (IntersectionError - TErr) * xLen) return None
    Some(x * (1 / xLen))
  }

  private def intersectionStable(a0: Vec3, a1: Vec3,
                                 b0: Vec3, b1: Vec3): Option[Vec3] = {
    // Longer edge computes the normal; shorter interpolates.
    val aLen2 = (a1 - a0).norm2
    val bLen2 = (b1 - b0).norm2
    if (aLen2 < bLen2 || (aLen2 == bLen2 && compareEdges(a0, a1, b0, b1)))
      intersectionStableSorted(b0, b1, a0, a1)
    else intersectionStableSorted(a0, a1, b0, b1)
  }

  private def bd(d: Double) = new java.math.BigDecimal(d)
  private final case class BVec(x: java.math.BigDecimal, y: java.math.BigDecimal,
                                z: java.math.BigDecimal) {
    def cross(o: BVec): BVec = BVec(
      y.multiply(o.z).subtract(z.multiply(o.y)),
      z.multiply(o.x).subtract(x.multiply(o.z)),
      x.multiply(o.y).subtract(y.multiply(o.x)))
    def toVec3: Vec3 = Vec3(x.doubleValue(), y.doubleValue(), z.doubleValue())
  }
  private def bvec(v: Vec3) = BVec(bd(v.x), bd(v.y), bd(v.z))

  /** Exact-arithmetic tier (edge_crossings.go:327-371). */
  private def intersectionExact(a0: Vec3, a1: Vec3, b0: Vec3, b1: Vec3): Vec3 = {
    val aNormP = bvec(a0).cross(bvec(a1))
    val bNormP = bvec(b0).cross(bvec(b1))
    val xP = aNormP.cross(bNormP)
    // Like PreciseVector.Vector(): convert to float64, then normalize.
    val x = xP.toVec3.normalize
    if (x == Vec3.zero) {
      // Exactly collinear: return the lexicographically smallest endpoint
      // interior to the other edge (simulation of simplicity).
      val big = Vec3(10, 10, 10)
      val aNorm = aNormP.toVec3
      val bNorm = bNormP.toVec3
      var best = big
      if (EdgeCrossings.orderedCCW(b0, a0, b1, bNorm) && cmp(a0, best) == -1) best = a0
      if (EdgeCrossings.orderedCCW(b0, a1, b1, bNorm) && cmp(a1, best) == -1) best = a1
      if (EdgeCrossings.orderedCCW(a0, b0, a1, aNorm) && cmp(b0, best) == -1) best = b0
      if (EdgeCrossings.orderedCCW(a0, b1, a1, aNorm) && cmp(b1, best) == -1) best = b1
      return best
    }
    x
  }

  /** Intersection point of two crossing edges, within IntersectionError
    * of the true intersection; result independent of edge order/direction
    * (edge_crossings.go:172-205).
    */
  def intersection(a0: Vec3, a1: Vec3, b0: Vec3, b1: Vec3): Vec3 = {
    var pt = intersectionStable(a0, a1, b0, b1)
      .getOrElse(intersectionExact(a0, a1, b0, b1))
    if (pt.dot((a0 + a1) + (b0 + b1)) < 0) pt = pt * -1
    pt
  }
}
