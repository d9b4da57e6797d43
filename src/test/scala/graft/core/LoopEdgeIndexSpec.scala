package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The indexed PIP path must agree bit-for-bit with the brute-force
  * crossing count (the reference's own cross-validation style,
  * loop_test.go TestLoopContainsMatchesCrossingSign /
  * shapeutil.go containsBruteForce), and the per-probe edge work must be
  * sublinear in the vertex count (shapeindex subdivision guarantee).
  */
class LoopEdgeIndexSpec extends AnyFunSuite {

  private def star(center: Vec3, n: Int, rOuter: Double, rInner: Double): Loop = {
    // Concave star polygon: alternating radii — a worst-ish case for
    // cell bucketing since edges zig-zag across cell boundaries.
    val z = center
    val y = z.ortho
    val x = y.cross(z)
    val verts = Array.tabulate(n) { i =>
      val r = if (i % 2 == 0) rOuter else rInner
      val a = 2 * math.Pi * i / n
      val p = Vec3(math.sin(r) * math.cos(a), math.sin(r) * math.sin(a), math.cos(r))
      (x * p.x + y * p.y + z * p.z).normalize
    }
    Loop.fromPoints(verts)
  }

  private val rng = new scala.util.Random(20260817)

  private def samplesAround(center: Vec3, spreadRad: Double, n: Int): Seq[Vec3] = {
    val z = center
    val y = z.ortho
    val x = y.cross(z)
    Seq.fill(n) {
      val r = rng.nextDouble() * spreadRad
      val a = rng.nextDouble() * 2 * math.Pi
      val p = Vec3(math.sin(r) * math.cos(a), math.sin(r) * math.sin(a), math.cos(r))
      (x * p.x + y * p.y + z * p.z).normalize
    }
  }

  test("indexed containsPoint matches brute force on a 4096-gon") {
    val c = LatLng.toPointDegrees(43.7, 7.3)
    val loop = Loop.regularLoop(c, 0.05, 4096)
    assert(loop.edgeIndexOption.isDefined, "large loop must build an index")
    for (p <- samplesAround(c, 0.08, 2000)) {
      assert(loop.containsPoint(p) === loop.bruteForceContainsPoint(p),
        s"parity mismatch at $p")
    }
  }

  test("indexed containsPoint matches brute force on a concave star") {
    val c = LatLng.toPointDegrees(-12.0, 130.0)
    val loop = star(c, 512, 0.06, 0.02)
    assert(loop.edgeIndexOption.isDefined)
    for (p <- samplesAround(c, 0.08, 2000)) {
      assert(loop.containsPoint(p) === loop.bruteForceContainsPoint(p),
        s"parity mismatch at $p")
    }
  }

  test("probe cost is sublinear in vertex count") {
    val c = LatLng.toPointDegrees(43.7, 7.3)
    val pts = samplesAround(c, 0.052, 500) // concentrated near the boundary
    val costs = Seq(512, 2048, 8192).map { n =>
      val loop = Loop.regularLoop(c, 0.05, n)
      val idx = loop.edgeIndexOption.get
      idx.edgeTests = 0
      pts.foreach(loop.containsPoint)
      idx.edgeTests.toDouble / pts.size
    }
    // Average edges tested per probe stays bounded by the subdivision
    // cap's neighborhood, not by V: 16x more vertices must not cost even
    // 2x more per probe.
    assert(costs.last <= 2 * costs.head + 1,
      s"probe cost grew with V: $costs")
    assert(costs.last < 64, s"probe cost not bounded: $costs")
  }

  test("small loops skip the index (brute-force threshold, loop.go:615)") {
    val loop = Loop.regularLoop(LatLng.toPointDegrees(0, 0), 0.05, 32)
    assert(loop.edgeIndexOption.isEmpty)
  }

  test("index handles loops spanning multiple faces and the poles") {
    val arctic = Loop.parse(
      (0 until 48).map(i => s"80:${-180 + i * 7.5}").mkString(", "))
    assert(arctic.edgeIndexOption.isDefined)
    assert(arctic.containsPoint(Vec3(0, 0, 1)) ===
      arctic.bruteForceContainsPoint(Vec3(0, 0, 1)))
    for (lng <- -180 until 180 by 5; lat <- Seq(75.0, 79.9, 80.1, 85.0)) {
      val p = LatLng.toPointDegrees(lat, lng)
      assert(arctic.containsPoint(p) === arctic.bruteForceContainsPoint(p),
        s"mismatch at $lat:$lng")
    }
  }
}
