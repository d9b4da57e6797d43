package graft.core

import java.math.{BigDecimal => BigDec}

/** Tiered-exactness orientation predicates.
  *
  * Mirrors the reference's tiering (/root/reference/s2/predicates.go:142-470):
  * cheap float determinant -> numerically stable recomputation -> exact
  * arbitrary-precision determinant -> symbolic perturbation (simulation of
  * simplicity). The exact tier uses java.math.BigDecimal, which represents
  * sums/differences/products of doubles exactly — the same guarantee Go gets
  * from big.Float at MaxPrec.
  */
object Predicates {
  /** Go's machineEpsilon64 = 0x1p-52. */
  final val MachineEps: Double = java.lang.Math.ulp(1.0)
  final val MaxDeterminantError: Double = 1.8274 * MachineEps
  final val DetErrorMultiplier: Double = 3.2321 * MachineEps
  private final val SmallestNormal: Double = java.lang.Double.MIN_NORMAL

  final val Clockwise = -1
  final val Indeterminate = 0
  final val CounterClockwise = 1

  /** Strictly-CCW test via (C x A) . B > 0 (predicates.go:142-154). */
  def sign(a: Vec3, b: Vec3, c: Vec3): Boolean =
    c.cross(a).dot(b) > 0

  /** Cheap tier (predicates.go:251-260). */
  def triageSign(a: Vec3, b: Vec3, c: Vec3): Int = {
    val det = a.cross(b).dot(c)
    if (det > MaxDeterminantError) CounterClockwise
    else if (det < -MaxDeterminantError) Clockwise
    else Indeterminate
  }

  /** Stable tier: translate so the longest edge is AB (predicates.go:200-243). */
  def stableSign(a: Vec3, b: Vec3, c: Vec3): Int = {
    val ab = b - a; val ab2 = ab.norm2
    val bc = c - b; val bc2 = bc.norm2
    val ca = a - c; val ca2 = ca.norm2
    var e1 = Vec3.zero; var e2 = Vec3.zero; var op = Vec3.zero
    if (ab2 >= bc2 && ab2 >= ca2) { e1 = ca; e2 = bc; op = c }
    else if (bc2 >= ca2) { e1 = ab; e2 = ca; op = a }
    else { e1 = bc; e2 = ab; op = b }
    val det = -e1.cross(e2).dot(op)
    val maxErr = DetErrorMultiplier * math.sqrt(e1.norm2 * e2.norm2)
    val minNoUnderflow = DetErrorMultiplier * math.sqrt(SmallestNormal)
    if (maxErr < minNoUnderflow) Indeterminate
    else if (det > maxErr) CounterClockwise
    else if (det < -maxErr) Clockwise
    else Indeterminate
  }

  /** Exact tier entry (predicates.go:265-286). */
  def expensiveSign(a: Vec3, b: Vec3, c: Vec3): Int = {
    if (a == b || b == c || c == a) return Indeterminate
    val s = stableSign(a, b, c)
    if (s != Indeterminate) s else exactSign(a, b, c, perturb = true)
  }

  /** Public tiered entry (predicates.go:180-186). */
  def robustSign(a: Vec3, b: Vec3, c: Vec3): Int = {
    val s = triageSign(a, b, c)
    if (s != Indeterminate) s else expensiveSign(a, b, c)
  }

  private def cmp(a: Vec3, b: Vec3): Int = {
    if (a.x < b.x) -1 else if (a.x > b.x) 1
    else if (a.y < b.y) -1 else if (a.y > b.y) 1
    else if (a.z < b.z) -1 else if (a.z > b.z) 1
    else 0
  }

  /** Exact determinant sign with optional symbolic perturbation
    * (predicates.go:290-329).
    */
  def exactSign(a0: Vec3, b0: Vec3, c0: Vec3, perturb: Boolean): Int = {
    var permSign = CounterClockwise
    var a = a0; var b = b0; var c = c0
    if (cmp(a, b) > 0) { val t = a; a = b; b = t; permSign = -permSign }
    if (cmp(b, c) > 0) { val t = b; b = c; c = t; permSign = -permSign }
    if (cmp(a, b) > 0) { val t = a; a = b; b = t; permSign = -permSign }

    val ax = new BigDec(a.x); val ay = new BigDec(a.y); val az = new BigDec(a.z)
    val bx = new BigDec(b.x); val by = new BigDec(b.y); val bz = new BigDec(b.z)
    val cx = new BigDec(c.x); val cy = new BigDec(c.y); val cz = new BigDec(c.z)

    // B x C exactly.
    val bcX = by.multiply(cz).subtract(bz.multiply(cy))
    val bcY = bz.multiply(cx).subtract(bx.multiply(cz))
    val bcZ = bx.multiply(cy).subtract(by.multiply(cx))
    val det = ax.multiply(bcX).add(ay.multiply(bcY)).add(az.multiply(bcZ))

    var detSign = det.signum
    if (detSign == 0 && perturb)
      detSign = symbolicallyPerturbedSign(ax, ay, az, bx, by, bz, cx, cy, cz,
        bcX, bcY, bcZ)
    permSign * detSign
  }

  /** Simulation-of-simplicity tie-break; requires exact det == 0 and
    * A < B < C lexicographically (predicates.go:354-470).
    */
  private def symbolicallyPerturbedSign(
      ax: BigDec, ay: BigDec, az: BigDec,
      bx: BigDec, by: BigDec, bz: BigDec,
      cx: BigDec, cy: BigDec, cz: BigDec,
      bcX: BigDec, bcY: BigDec, bcZ: BigDec): Int = {
    var s = bcZ.signum // da.Z
    if (s != 0) return s
    s = bcY.signum // da.Y
    if (s != 0) return s
    s = bcX.signum // da.X
    if (s != 0) return s

    s = cx.multiply(ay).subtract(cy.multiply(ax)).signum // db.Z
    if (s != 0) return s
    s = cx.signum // db.Z * da.Y
    if (s != 0) return s
    s = -cy.signum // db.Z * da.X
    if (s != 0) return s
    s = cz.multiply(ax).subtract(cx.multiply(az)).signum // db.Y
    if (s != 0) return s
    s = cz.signum // db.Y * da.X
    if (s != 0) return s
    s = ax.multiply(by).subtract(ay.multiply(bx)).signum // dc.Z
    if (s != 0) return s
    s = -bx.signum // dc.Z * da.Y
    if (s != 0) return s
    s = by.signum // dc.Z * da.X
    if (s != 0) return s
    s = ax.signum // dc.Z * db.Y
    if (s != 0) return s
    CounterClockwise // dc.Z * db.Y * da.X
  }

  // ------------------------------------------------------------------
  // Exact distance comparison (the CompareDistances tier of
  // /root/reference/s2/predicates.go:561-731): decides the sign of
  // d(x,a) - d(x,b) with a cheap double triage and an exact BigDecimal
  // fallback. Squared chord length is the distance currency
  // (monotone in angle, s1/chordangle.go:107), and sums/products of
  // doubles are exactly representable in BigDecimal, so the fallback
  // tier is exact.

  /** Squared chord |x-y|^2 in double (point.go:141-143 without the cap
    * at 4, which does not affect comparisons).
    */
  def chord2(x: Vec3, y: Vec3): Double = {
    val dx = x.x - y.x
    val dy = x.y - y.y
    val dz = x.z - y.z
    dx * dx + dy * dy + dz * dz
  }

  private def bd(d: Double) = new java.math.BigDecimal(d)

  /** Exact squared chord as a BigDecimal. */
  def chord2Exact(x: Vec3, y: Vec3): java.math.BigDecimal = {
    val dx = bd(x.x).subtract(bd(y.x))
    val dy = bd(x.y).subtract(bd(y.y))
    val dz = bd(x.z).subtract(bd(y.z))
    dx.multiply(dx).add(dy.multiply(dy)).add(dz.multiply(dz))
  }

  /** Sign of a dot product with a triage tier + exact fallback
    * (predicates.go:733-766). Supports un-normalized vectors up to
    * length sqrt(2) (cell edge normals).
    */
  def signDotProd(a: Vec3, b: Vec3): Int = {
    val maxError = 3.046875 * MachineEps
    val na = a.dot(b)
    if (math.abs(na) > maxError) return if (na > 0) 1 else -1
    bd(a.x).multiply(bd(b.x)).add(bd(a.y).multiply(bd(b.y)))
      .add(bd(a.z).multiply(bd(b.z))).signum
  }

  /** Order of two edge crossings of great circle M relative to reference
    * circle N (predicates.go:770-925): -1 when AB's crossing is closer
    * to N than CD's, 0 at the same position, +1 when farther. Edges must
    * cross M with A, C on its positive side; valid within 90 degrees of
    * N. Quadruple products expand via Lagrange to
    * (M.A)(N.B) - (M.B)(N.A), triaged at 32 eps then exact.
    */
  def circleEdgeIntersectionOrdering(a: Vec3, b: Vec3, c: Vec3, d: Vec3,
                                     m: Vec3, n: Vec3): Int = {
    val maxError = 32 * MachineEps
    val prodab = m.dot(a) * n.dot(b) - m.dot(b) * n.dot(a)
    val prodcd = m.dot(c) * n.dot(d) - m.dot(d) * n.dot(c)
    if (math.abs(prodab - prodcd) > maxError)
      return if (prodab < prodcd) -1 else 1
    if ((a == c && b == d) || (a == d && b == c)) return 0
    def dotE(u: Vec3, v: Vec3) =
      bd(u.x).multiply(bd(v.x)).add(bd(u.y).multiply(bd(v.y)))
        .add(bd(u.z).multiply(bd(v.z)))
    val ab = dotE(m, a).multiply(dotE(n, b))
      .subtract(dotE(m, b).multiply(dotE(n, a)))
    val cd = dotE(m, c).multiply(dotE(n, d))
      .subtract(dotE(m, d).multiply(dotE(n, c)))
    ab.compareTo(cd)
  }

  /** Sign of d(x,a) - d(x,b): +1 when a is farther, -1 when b is
    * farther, 0 for exactly equidistant points. Triage bound: each
    * component difference carries <= 0.5 ulp error, each product <= 1.5
    * ulp relative, the 3-term sum <= 2 ulps => 4.5*eps*(da+db) is a safe
    * separation; anything closer goes to the exact tier.
    */
  def compareDistances(x: Vec3, a: Vec3, b: Vec3): Int = {
    val da = chord2(x, a)
    val db = chord2(x, b)
    val err = 4.5 * MachineEps * (da + db)
    if (da - db > err) return 1
    if (db - da > err) return -1
    chord2Exact(x, a).compareTo(chord2Exact(x, b))
  }
}
