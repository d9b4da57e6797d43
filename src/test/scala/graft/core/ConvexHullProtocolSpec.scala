package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** ConvexHullQuery edge-case protocols from convex_hull_query_test.go:
  * empty input, single/two points (3-vertex degenerate loops), antipodal
  * points (full hull), duplicate stability, and the points-inside-hull
  * idempotence fuzz.
  */
class ConvexHullProtocolSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(2718)

  test("no points yields the empty loop") {
    assert(ConvexHull.hullLoop(Seq.empty).isEmpty)
  }

  test("one point yields a normalized 3-vertex loop containing it") {
    val p = Vec3(0, 0, 1)
    val hull = ConvexHull.hullLoop(Seq(p))
    assert(hull.numVertices === 3)
    assert(hull.isNormalized)
    assert(hull.vertices.contains(p))
    // duplicates do not change the result
    val dup = ConvexHull.hullLoop(Seq(p, p, p))
    assert(dup.vertices.toSeq === hull.vertices.toSeq)
  }

  test("two points yield a normalized 3-vertex loop with both") {
    val p = Vec3(0, 0, 1)
    val q = Vec3(0, 1, 0)
    val hull = ConvexHull.hullLoop(Seq(p, q))
    assert(hull.numVertices === 3)
    assert(hull.isNormalized)
    assert(hull.vertices.contains(p) && hull.vertices.contains(q))
    val dup = ConvexHull.hullLoop(Seq(q, p, p, q))
    assert(dup.vertices.toSeq.toSet === hull.vertices.toSeq.toSet)
  }

  test("antipodal points yield the full loop") {
    assert(ConvexHull.hullLoop(Seq(Vec3(0, 0, 1), Vec3(0, 0, -1))).isFull)
  }

  test("adding points inside the hull never changes it (idempotence fuzz)") {
    var checked = 0
    for (_ <- 0 until 150) {
      // random cap well under a hemisphere
      val center = Vec3(rng.nextGaussian(), rng.nextGaussian(),
        rng.nextGaussian()).normalize
      val radius = 1e-4 + rng.nextDouble() * 0.5
      def sample(): Vec3 = {
        // uniform-ish point in the cap: offset in the tangent plane
        val t1 = center.ortho
        val t2 = center.cross(t1)
        val r = radius * math.sqrt(rng.nextDouble())
        val a = rng.nextDouble() * 2 * math.Pi
        (center + t1 * (r * math.cos(a)) + t2 * (r * math.sin(a))).normalize
      }
      val pts = Seq.fill(3 + rng.nextInt(60))(sample())
      val hull = ConvexHull.hullLoop(pts)
      if (hull.numVertices >= 3 && !hull.isFull) {
        checked += 1
        // interior points of the hull (vertex centroid pulls, interpolants)
        val inside = Seq.fill(20)(sample()).filter(hull.containsPoint)
        val hull2 = ConvexHull.hullLoop(pts ++ inside)
        assert(hull2.vertices.toSeq === hull.vertices.toSeq,
          s"hull changed after adding ${inside.length} interior points")
      }
    }
    assert(checked > 100, s"fuzz too weak: only $checked hulls checked")
  }
}
