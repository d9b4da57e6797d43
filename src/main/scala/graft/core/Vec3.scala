package graft.core

/** Immutable 3-vector on/around the unit sphere.
  *
  * Semantics follow the reference geometry library's 3-D vector type
  * (/root/reference/r3/vector.go): plain double arithmetic, no FMA, so
  * results are bit-compatible with Go's non-fused float64 semantics.
  */
final case class Vec3(x: Double, y: Double, z: Double) {
  def +(o: Vec3): Vec3 = Vec3(x + o.x, y + o.y, z + o.z)
  def -(o: Vec3): Vec3 = Vec3(x - o.x, y - o.y, z - o.z)
  def *(m: Double): Vec3 = Vec3(m * x, m * y, m * z)
  def dot(o: Vec3): Double = x * o.x + y * o.y + z * o.z
  def cross(o: Vec3): Vec3 =
    Vec3(y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x)
  def norm2: Double = dot(this)
  def norm: Double = math.sqrt(norm2)

  def normalize: Vec3 = {
    val n2 = norm2
    if (n2 == 0) Vec3(0, 0, 0) else this * (1 / math.sqrt(n2))
  }

  def abs: Vec3 = Vec3(math.abs(x), math.abs(y), math.abs(z))

  /** Angle between this and o in radians (r3/vector.go:88). */
  def angle(o: Vec3): Double = math.atan2(cross(o).norm, dot(o))

  /** Axis of the largest-magnitude component: 0=X, 1=Y, 2=Z
    * (r3/vector.go:118-131; ties resolved identically).
    */
  def largestComponent: Int = {
    val t = abs
    if (t.x > t.y) { if (t.x > t.z) 0 else 2 }
    else { if (t.y > t.z) 1 else 2 }
  }

  /** A unit vector orthogonal to this one; same deterministic choice as
    * the reference's Ortho (s2/point.go:250-261).
    */
  /** This point rotated by `angleRad` around `axis`, CCW as seen from
    * the positive axis direction (point.go Rotate): decompose into the
    * axial component (fixed) and the orthogonal pair spanning the
    * rotation plane.
    */
  def rotate(axis: Vec3, angleRad: Double): Vec3 = {
    val center = axis * this.dot(axis)
    val axial = this - center
    if (axial.norm2 == 0) return this
    val orthogonal = axis.cross(this)
    (orthogonal * math.sin(angleRad) + axial * math.cos(angleRad) + center).normalize
  }

  def ortho: Vec3 = {
    val o = largestComponent match {
      case 0 => Vec3(0.012, 0.0053, 1)
      case 1 => Vec3(1, 0.0053, 0.00457)
      case _ => Vec3(0.012, 1, 0.00457)
    }
    cross(o).normalize
  }

  def isUnit: Boolean = math.abs(norm2 - 1) <= 5e-14
}

object Vec3 {
  val zero: Vec3 = Vec3(0, 0, 0)
}
