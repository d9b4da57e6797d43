package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-validation of the loop/polygon relations on
  * NON-convex geometry (the oracle-checked driver queries cover convex
  * fixtures; the 90-case truth table covers constructed cases). Star
  * polygons with random spikes exercise compareBoundary / wedge paths,
  * checked against one-sided point-sampling witnesses and algebraic
  * consistency identities.
  */
class LoopRelationsFuzzSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(161803)

  /** Star loop: alternating outer/inner radii with jitter (non-convex). */
  private def star(center: Vec3, n: Int, rOuter: Double, rInner: Double): Loop = {
    val z = center
    val y = z.ortho
    val x = y.cross(z)
    Loop.fromPoints(Array.tabulate(2 * n) { i =>
      val base = if (i % 2 == 0) rOuter else rInner
      val r = base * (0.85 + 0.3 * rng.nextDouble())
      val a = math.Pi * i / n
      val p = Vec3(math.sin(r) * math.cos(a), math.sin(r) * math.sin(a), math.cos(r))
      (x * p.x + y * p.y + z * p.z).normalize
    })
  }

  /** Sample points of the loop's region: spiral within its bound. */
  private def samplesIn(l: Loop, k: Int): Seq[Vec3] = {
    val b = l.bound
    val out = scala.collection.mutable.ArrayBuffer[Vec3]()
    var tries = 0
    while (out.length < k && tries < k * 60) {
      val lat = b.lat.lo + rng.nextDouble() * (b.lat.hi - b.lat.lo)
      val lng = b.lng.lo + rng.nextDouble() * (b.lng.hi - b.lng.lo)
      val p = LatLng.toPoint(lat, lng)
      if (l.containsPoint(p)) out += p
      tries += 1
    }
    out.toSeq
  }

  test("star loop relations agree with point-sampling witnesses") {
    var checkedContains = 0
    var checkedDisjoint = 0
    for (round <- 0 until 120) {
      val cLat = rng.nextDouble() * 120 - 60
      val cLng = rng.nextDouble() * 360 - 180
      val c1 = LatLng.toPointDegrees(cLat, cLng)
      // second center: sometimes nearby (overlap likely), sometimes far
      val c2 =
        if (rng.nextBoolean()) LatLng.toPointDegrees(
          cLat + rng.nextDouble() * 0.2 - 0.1, cLng + rng.nextDouble() * 0.2 - 0.1)
        else LatLng.toPointDegrees(
          math.max(-80, math.min(80, cLat + 20 + rng.nextDouble() * 10)), cLng)
      val a = star(c1, 6 + rng.nextInt(10), 0.05 + rng.nextDouble() * 0.05,
        0.01 + rng.nextDouble() * 0.02)
      val b = star(c2, 6 + rng.nextInt(10), 0.02 + rng.nextDouble() * 0.02,
        0.005 + rng.nextDouble() * 0.01)

      val aContainsB = a.contains(b)
      val bContainsA = b.contains(a)
      val inter = a.intersects(b)

      // algebraic identities
      assert(inter === b.intersects(a), s"round $round: intersects asymmetric")
      if (aContainsB && !b.isEmpty) assert(inter, s"round $round: contains => intersects")
      if (bContainsA && !a.isEmpty) assert(inter, s"round $round: contains => intersects")
      if (aContainsB && bContainsA)
        assert(math.abs(a.area - b.area) < 1e-9, s"round $round: mutual containment")
      if (aContainsB) assert(a.area >= b.area - 1e-12, s"round $round: area monotone")

      // witness checks (one-sided but exact)
      val bSamples = samplesIn(b, 25)
      val aSamples = samplesIn(a, 25)
      if (aContainsB) {
        checkedContains += 1
        bSamples.foreach(p => assert(a.containsPoint(p),
          s"round $round: contains violated at $p"))
      }
      if (!inter) {
        checkedDisjoint += 1
        bSamples.foreach(p => assert(!a.containsPoint(p),
          s"round $round: disjoint violated (b point in a)"))
        aSamples.foreach(p => assert(!b.containsPoint(p),
          s"round $round: disjoint violated (a point in b)"))
      }
      // a sampled point inside both forces intersects
      if (bSamples.exists(a.containsPoint))
        assert(inter, s"round $round: common point but not intersecting")
    }
    // the generator must actually produce both regimes
    assert(checkedDisjoint > 10, s"fuzz too weak: $checkedDisjoint disjoint cases")
  }

  test("multi-loop polygon relations agree with parity sampling") {
    for (round <- 0 until 40) {
      val cLat = rng.nextDouble() * 100 - 50
      val cLng = rng.nextDouble() * 360 - 180
      val c = LatLng.toPointDegrees(cLat, cLng)
      val shell = star(c, 8 + rng.nextInt(6), 0.08, 0.05)
      val hole = Loop.regularLoop(c, 0.015 + rng.nextDouble() * 0.01, 16)
      val annulus = Polygon.fromLoops(Seq(shell, hole))
      val disc = Polygon.fromLoops(Seq(
        Loop.regularLoop(c, 0.008, 16))) // inside the hole
      // the disc sits in the hole: not contained, not intersecting
      assert(!annulus.contains(disc), s"round $round")
      assert(!annulus.intersects(disc), s"round $round")
      // parity containment matches per-point sampling
      for (_ <- 0 until 40) {
        val b = shell.bound
        val lat = b.lat.lo + rng.nextDouble() * (b.lat.hi - b.lat.lo)
        val lng = b.lng.lo + rng.nextDouble() * (b.lng.hi - b.lng.lo)
        val p = LatLng.toPoint(lat, lng)
        val want = shell.containsPoint(p) ^ hole.containsPoint(p)
        assert(annulus.containsPoint(p) === want, s"round $round parity at $p")
      }
    }
  }
}
