package graft.core

/** Edge-crossing kernels: stateless crossing tests plus a stateful crosser
  * optimized for edge chains (/root/reference/s2/edge_crosser.go:15-228,
  * edge_crossings.go:88-159,425-444).
  */
object EdgeCrossings {
  final val DoNotCross = -1
  final val MaybeCross = 0
  final val Cross = 1

  /** Fixed reference point used for containment parity
    * (/root/reference/s2/point.go:67-69).
    */
  val originPoint: Vec3 =
    Vec3(-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195)

  /** Reference direction for semi-open vertex containment (point.go:267-269). */
  def referenceDir(a: Vec3): Vec3 = a.ortho

  /** Robust cross product; nonzero even for p == +-op (point.go:82-95). */
  def pointCross(p: Vec3, op: Vec3): Vec3 = {
    val x = (p + op).cross(op - p)
    if (x == Vec3.zero) p.ortho else x
  }

  /** Whether edges OA, OB, OC occur in that order sweeping CCW around O
    * (point.go:110-124).
    */
  def orderedCCW(a: Vec3, b: Vec3, c: Vec3, o: Vec3): Boolean = {
    var sum = 0
    if (Predicates.robustSign(b, o, a) != Predicates.Clockwise) sum += 1
    if (Predicates.robustSign(c, o, b) != Predicates.Clockwise) sum += 1
    if (Predicates.robustSign(a, o, c) == Predicates.CounterClockwise) sum += 1
    sum >= 2
  }

  /** Shared-vertex crossing parity rule (edge_crossings.go:117-144). */
  def vertexCrossing(a: Vec3, b: Vec3, c: Vec3, d: Vec3): Boolean = {
    if (a == b || c == d) return false
    if (a == c) return (b == d) || orderedCCW(referenceDir(a), d, b, a)
    if (b == d) return orderedCCW(referenceDir(b), c, a, b)
    if (a == d) return (b == c) || orderedCCW(referenceDir(a), c, b, a)
    if (b == c) return orderedCCW(referenceDir(b), d, a, b)
    false
  }

  /** Wedge-based vertex containment: with consecutive loop vertices A,B,C,
    * does the loop contain vertex B (edge_crossings.go:434-444).
    */
  def angleContainsVertex(a: Vec3, b: Vec3, c: Vec3): Boolean =
    !orderedCCW(referenceDir(b), c, a, b)

  /** Stateless interior-crossing sign of AB x CD (edge_crossings.go:88-91). */
  def crossingSign(a: Vec3, b: Vec3, c: Vec3, d: Vec3): Int = {
    val cr = new EdgeCrosser(a, b)
    cr.restartAt(c)
    cr.chainCrossingSign(d)
  }

  /** Crossing extended with vertex-crossing parity (edge_crossings.go:150-159). */
  def edgeOrVertexCrossing(a: Vec3, b: Vec3, c: Vec3, d: Vec3): Boolean =
    crossingSign(a, b, c, d) match {
      case Cross => true
      case DoNotCross => false
      case _ => vertexCrossing(a, b, c, d)
    }
}

/** Stateful crosser with fixed edge AB, streaming chain vertices C, D, ...
  * (edge_crosser.go:37-228). Reuse one instance per thread/row-batch.
  */
final class EdgeCrosser(a: Vec3, b: Vec3) {
  import EdgeCrossings._
  import Predicates._

  private val norm: Vec3 = pointCross(a, b)
  private val aTangent: Vec3 = a.cross(norm)
  private val bTangent: Vec3 = norm.cross(b)
  private var c: Vec3 = Vec3.zero
  private var haveC = false
  private var acb: Int = Indeterminate

  def restartAt(c0: Vec3): Unit = {
    c = c0
    haveC = true
    acb = -triageSign(a, b, c)
  }

  def crossingSignTo(c0: Vec3, d: Vec3): Int = {
    if (!haveC || c != c0) restartAt(c0)
    chainCrossingSign(d)
  }

  def edgeOrVertexCrossingTo(c0: Vec3, d: Vec3): Boolean = {
    if (!haveC || c != c0) restartAt(c0)
    edgeOrVertexChainCrossing(d)
  }

  def chainCrossingSign(d: Vec3): Int = {
    val bda = triageSign(a, b, d)
    if (acb == -bda && bda != Indeterminate) {
      c = d
      acb = -bda
      DoNotCross
    } else slowCrossingSign(d, bda)
  }

  def edgeOrVertexChainCrossing(d: Vec3): Boolean = {
    val c0 = c
    chainCrossingSign(d) match {
      case Cross => true
      case DoNotCross => false
      case _ => vertexCrossing(a, b, c0, d)
    }
  }

  private def slowCrossingSign(d: Vec3, bda0: Int): Int = {
    var bda = bda0
    val result: Int = {
      // Tangent-plane fast reject for the collinear-but-disjoint case.
      val maxError = (1.5 + 1 / math.sqrt(3.0)) * MachineEps
      if ((c.dot(aTangent) > maxError && d.dot(aTangent) > maxError) ||
          (c.dot(bTangent) > maxError && d.dot(bTangent) > maxError)) DoNotCross
      else if (a == c || a == d || b == c || b == d) MaybeCross
      else if (a == b || c == d) DoNotCross
      else {
        if (acb == Indeterminate) acb = -expensiveSign(a, b, c)
        if (bda == Indeterminate) bda = expensiveSign(a, b, d)
        if (bda != acb) DoNotCross
        else {
          val cbd = -robustSign(c, d, b)
          if (cbd != acb) DoNotCross
          else {
            val dac = robustSign(c, d, a)
            if (dac != acb) DoNotCross else Cross
          }
        }
      }
    }
    c = d
    acb = -bda
    result
  }
}
