package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The exact distance-comparison tier must agree with exact arithmetic
  * everywhere, including ties the double triage cannot see
  * (predicates.go:561-731 semantics).
  */
class CompareDistancesSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(424242)

  private def randPoint(): Vec3 =
    Vec3(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian()).normalize

  test("matches exact BigDecimal sign on random triples") {
    for (_ <- 0 until 5000) {
      val x = randPoint(); val a = randPoint(); val b = randPoint()
      val got = Predicates.compareDistances(x, a, b)
      val want = Predicates.chord2Exact(x, a).compareTo(Predicates.chord2Exact(x, b))
      assert(got === want, s"x=$x a=$a b=$b")
    }
  }

  test("near-ties the double triage cannot separate are decided exactly") {
    for (_ <- 0 until 2000) {
      val x = randPoint()
      val a = randPoint()
      // b = a perturbed by one ulp in one coordinate: double chord2 of
      // (x,a) and (x,b) are often bit-identical, the exact values differ.
      val k = rng.nextInt(3)
      val bumped = k match {
        case 0 => Vec3(Math.nextUp(a.x), a.y, a.z)
        case 1 => Vec3(a.x, Math.nextUp(a.y), a.z)
        case _ => Vec3(a.x, a.y, Math.nextUp(a.z))
      }
      val got = Predicates.compareDistances(x, a, bumped)
      val want = Predicates.chord2Exact(x, a).compareTo(Predicates.chord2Exact(x, bumped))
      assert(got === want)
    }
  }

  test("signDotProd matches exact arithmetic incl. forced near-zero cases") {
    def exactSign(a: Vec3, b: Vec3): Int = {
      def bd(d: Double) = new java.math.BigDecimal(d)
      bd(a.x).multiply(bd(b.x)).add(bd(a.y).multiply(bd(b.y)))
        .add(bd(a.z).multiply(bd(b.z))).signum
    }
    for (_ <- 0 until 3000) {
      val a = randPoint(); val b = randPoint()
      assert(Predicates.signDotProd(a, b) === exactSign(a, b))
      // near-orthogonal pair: b in the plane orthogonal-ish to a
      val t = a.cross(randPoint()).normalize
      assert(Predicates.signDotProd(a, t) === exactSign(a, t))
      assert(Predicates.signDotProd(a, a) === 1)
      assert(Predicates.signDotProd(a, a * -1) === -1)
    }
  }

  test("circleEdgeIntersectionOrdering orders crossings consistently") {
    // Construct edges crossing circle M at controlled angular positions
    // and order them against reference circle N: the predicate must
    // agree with the analytic order of the crossing points.
    for (_ <- 0 until 2000) {
      val m = randPoint() // circle normal
      val e1 = m.ortho // on circle M, the "zero" direction
      val e2 = m.cross(e1).normalize
      def onCircle(theta: Double): Vec3 =
        (e1 * math.cos(theta) + e2 * math.sin(theta)).normalize
      // N chosen so its positive side covers theta in (0, Pi)
      val n = m.cross(onCircle(0.0)).normalize
      val t1 = 0.1 + rng.nextDouble() * 1.2
      val t2 = 0.1 + rng.nextDouble() * 1.2
      // Same tilt for both edges: the quadruple product compares the
      // crossing positions scaled by each edge's |AxB|, so the analytic
      // position order is only directly comparable for equal-geometry
      // edges (the reference's cell-boundary usage).
      val tilt = 0.05 + rng.nextDouble() * 0.3
      def edgeAt(theta: Double): (Vec3, Vec3) = {
        val x = onCircle(theta)
        ((x + m * tilt).normalize, (x - m * tilt).normalize)
      }
      val (a, b) = edgeAt(t1)
      val (c, d) = edgeAt(t2)
      val got = Predicates.circleEdgeIntersectionOrdering(a, b, c, d, m, n)
      // smaller theta = closer to N's zero point; dot with N grows with
      // sin(theta) which is monotone on (0, Pi/2]; both t's < 1.31 < Pi/2
      val want = java.lang.Double.compare(math.sin(t1), math.sin(t2))
      if (math.abs(math.sin(t1) - math.sin(t2)) > 1e-9) {
        assert(got === want, s"t1=$t1 t2=$t2")
      }
      // identical edges order as equal
      assert(Predicates.circleEdgeIntersectionOrdering(a, b, a, b, m, n) === 0)
    }
  }

  test("loop validation catches the reference's invalid cases") {
    assert(Loop.parse("0:0, 0:10, 10:10, 10:0").validate().isEmpty)
    assert(Loop.empty.validate().isEmpty)
    assert(Loop.full.validate().isEmpty)
    // not unit length
    assert(Loop.fromPoints(Array(Vec3(1, 0, 0), Vec3(0, 2, 0), Vec3(0, 0, 1)))
      .validate().isDefined)
    // fewer than 3 vertices
    assert(Loop.fromPoints(Array(Vec3(1, 0, 0), Vec3(0, 1, 0)))
      .validate().isDefined)
    // degenerate edge
    assert(Loop.parse("0:0, 0:10, 0:10, 10:10").validate().isDefined)
    // antipodal adjacent vertices
    assert(Loop.fromPoints(Array(Vec3(1, 0, 0), Vec3(-1, 0, 0), Vec3(0, 0, 1)))
      .validate().isDefined)
    // self-intersecting bowtie
    assert(Loop.parse("0:0, 10:10, 0:10, 10:0").validate().isDefined)
    assert(Loop.parse("0:0, 10:10, 0:10, 10:0")
      .validate(checkSelfIntersection = false).isEmpty)
  }

  test("identity, symmetry, and antisymmetry") {
    for (_ <- 0 until 500) {
      val x = randPoint(); val a = randPoint(); val b = randPoint()
      assert(Predicates.compareDistances(x, a, a) === 0)
      assert(Predicates.compareDistances(x, a, b) ===
        -Predicates.compareDistances(x, b, a))
    }
  }
}
