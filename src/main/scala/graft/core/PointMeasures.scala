package graft.core

/** Stable triangle measures on the sphere
  * (/root/reference/s2/point_measures.go:33-150, point.go:288-319).
  */
object PointMeasures {

  /** Kahan's stable angle: 2*atan2(|A-B|, |A+B|) (point.go:317-319). */
  def stableAngle(a: Vec3, b: Vec3): Double =
    2 * math.atan2((a - b).norm, (a + b).norm)

  /** Area of triangle ABC via l'Huilier with Girard fallback for skinny
    * triangles (point_measures.go:33-84).
    */
  def pointArea(a: Vec3, b: Vec3, c: Vec3): Double = {
    val sa = stableAngle(b, c)
    val sb = stableAngle(c, a)
    val sc = stableAngle(a, b)
    val s = 0.5 * (sa + sb + sc)
    if (s >= 3e-4) {
      val dmin = s - math.max(sa, math.max(sb, sc))
      if (dmin < 1e-2 * s * s * s * s * s) {
        val area = girardArea(a, b, c)
        if (dmin < s * 0.1 * (area + 5e-15)) return area
      }
    }
    4 * math.atan(math.sqrt(math.max(0.0,
      math.tan(0.5 * s) * math.tan(0.5 * (s - sa)) *
        math.tan(0.5 * (s - sb)) * math.tan(0.5 * (s - sc)))))
  }

  /** Girard's formula, fast but less accurate for tiny triangles
    * (point_measures.go:88-110).
    */
  def girardArea(a: Vec3, b: Vec3, c: Vec3): Double = {
    val ab = EdgeCrossings.pointCross(a, b)
    val bc = EdgeCrossings.pointCross(b, c)
    val ac = EdgeCrossings.pointCross(a, c)
    val area = ab.angle(ac) - ab.angle(bc) + bc.angle(ac)
    math.max(0, area)
  }

  /** Positive for CCW triangles, negative otherwise (point_measures.go:114-116). */
  def signedArea(a: Vec3, b: Vec3, c: Vec3): Double =
    Predicates.robustSign(a, b, c) * pointArea(a, b, c)

  /** Interior angle at vertex B of triangle ABC, in [0, Pi]
    * (point_measures.go:120-127).
    */
  def angle(a: Vec3, b: Vec3, c: Vec3): Double =
    EdgeCrossings.pointCross(a, b).angle(EdgeCrossings.pointCross(c, b))

  /** Exterior (turning) angle at B going A->B->C; positive for left turns
    * (point_measures.go:131-150).
    */
  def turnAngle(a: Vec3, b: Vec3, c: Vec3): Double = {
    val angle = EdgeCrossings.pointCross(a, b).angle(EdgeCrossings.pointCross(b, c))
    if (Predicates.sign(a, b, c)) angle else -angle
  }
}
