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

  test("identity, symmetry, and antisymmetry") {
    for (_ <- 0 until 500) {
      val x = randPoint(); val a = randPoint(); val b = randPoint()
      assert(Predicates.compareDistances(x, a, a) === 0)
      assert(Predicates.compareDistances(x, a, b) ===
        -Predicates.compareDistances(x, b, a))
    }
  }
}
