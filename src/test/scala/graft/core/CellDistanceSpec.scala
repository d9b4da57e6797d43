package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Cell distance functions cross-validated against brute-force
  * edge-distance math (the reference's own test style,
  * cell_test.go TestCellDistanceToPoint / DistanceToEdge / CellDistance).
  */
class CellDistanceSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(31337)

  private def randPoint(): Vec3 =
    Vec3(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian()).normalize

  private def randCell(maxLevel: Int = 12): Cell = {
    val p = randPoint()
    val leaf = CellId.fromPoint(p.x, p.y, p.z)
    Cell.fromId(CellId.parent(leaf, rng.nextInt(maxLevel + 1)))
  }

  /** Brute min chord distance from p to the cell boundary. */
  private def bruteBoundaryDist(c: Cell, p: Vec3): Double = {
    var best = ChordAngle.Straight
    for (k <- 0 until 4) {
      val d = ChordAngle.fromRadians(
        EdgeDistances.distanceFromSegment(p, c.vertex(k), c.vertex((k + 1) & 3)))
      if (d < best) best = d
    }
    best
  }

  test("distance to point matches brute force") {
    for (_ <- 0 until 2000) {
      val c = randCell()
      val p = randPoint()
      val got = c.distance(p)
      if (c.containsPoint(p)) {
        assert(got === 0.0)
      } else {
        val want = bruteBoundaryDist(c, p)
        assert(math.abs(got - want) <= 1e-12 * (1 + want),
          s"cell ${CellId.toToken(c.id)} p $p got $got want $want")
      }
      // boundary distance always matches the brute edge minimum
      val bGot = c.boundaryDistance(p)
      val bWant = bruteBoundaryDist(c, p)
      assert(math.abs(bGot - bWant) <= 1e-12 * (1 + bWant))
    }
  }

  test("max distance dominates sampled cell points") {
    for (_ <- 0 until 300) {
      val c = randCell()
      val p = randPoint()
      val maxD = c.maxDistance(p)
      // sample interior + boundary points of the cell
      for (_ <- 0 until 30) {
        val u = c.uLo + rng.nextDouble() * (c.uHi - c.uLo)
        val v = c.vLo + rng.nextDouble() * (c.vHi - c.vLo)
        val q = STUV.faceUVToXYZ(c.face, u, v).normalize
        assert(ChordAngle.between(p, q) <= maxD + 1e-12)
      }
      for (k <- 0 until 4) {
        assert(ChordAngle.between(p, c.vertex(k)) <= maxD + 1e-12)
      }
    }
  }

  test("distance to edge: zero iff intersecting, else min edge-pair distance") {
    for (_ <- 0 until 1000) {
      val c = randCell()
      val a = randPoint(); val b = randPoint()
      val got = c.distanceToEdge(a, b)
      if (got > 0) {
        var want = ChordAngle.Straight
        for (k <- 0 until 4) {
          val d = EdgeDistances.edgePairMinDistance(
            c.vertex(k), c.vertex((k + 1) & 3), a, b)
          if (d < want) want = d
        }
        assert(math.abs(got - want) <= 1e-12 * (1 + want))
      } else {
        // zero: an endpoint inside or a boundary crossing
        val inside = c.containsPoint(a) || c.containsPoint(b)
        val crossing = (0 until 4).exists(k =>
          EdgeCrossings.crossingSign(a, b, c.vertex(k), c.vertex((k + 1) & 3))
            != EdgeCrossings.DoNotCross)
        assert(inside || crossing)
      }
    }
  }

  test("cell-to-cell distance: zero on overlap, symmetric, triangle-consistent") {
    for (_ <- 0 until 500) {
      val c1 = randCell(8)
      val c2 = randCell(8)
      val d12 = c1.distanceToCell(c2)
      assert(math.abs(d12 - c2.distanceToCell(c1)) <= 1e-15)
      if (CellId.contains(c1.id, c2.id) || CellId.contains(c2.id, c1.id)) {
        assert(d12 === 0.0)
      }
      // any sampled pair of points is at least as far as the cell distance
      for (_ <- 0 until 10) {
        val q1 = STUV.faceUVToXYZ(c1.face,
          c1.uLo + rng.nextDouble() * (c1.uHi - c1.uLo),
          c1.vLo + rng.nextDouble() * (c1.vHi - c1.vLo)).normalize
        val q2 = STUV.faceUVToXYZ(c2.face,
          c2.uLo + rng.nextDouble() * (c2.uHi - c2.uLo),
          c2.vLo + rng.nextDouble() * (c2.vHi - c2.vLo)).normalize
        assert(ChordAngle.between(q1, q2) >= d12 - 1e-12)
      }
      // max distance dominates the min and sampled pairs
      val m12 = c1.maxDistanceToCell(c2)
      assert(m12 >= d12 - 1e-15)
    }
  }

  test("expandedByDistanceUV contains nearby points (cellid.go:811-857)") {
    for (_ <- 0 until 500) {
      val c = randCell(10)
      val dist = 1e-4 * math.pow(10, rng.nextDouble() * 2) // 1e-4..1e-2 rad
      val (uLo, uHi, vLo, vHi) = CellId.expandedByDistanceUV(
        c.uLo, c.uHi, c.vLo, c.vHi, dist)
      // points at most `dist` from the cell must fall inside the expanded
      // UV rect (when they project onto this face)
      for (_ <- 0 until 20) {
        val k = rng.nextInt(4)
        val onEdge = EdgeDistances.interpolate(rng.nextDouble(),
          c.vertex(k), c.vertex((k + 1) & 3))
        // push outward a random direction by at most dist
        val dir = onEdge.cross(randPoint()).normalize
        val q = (onEdge * math.cos(dist * 0.99) + dir * math.sin(dist * 0.99)).normalize
        STUV.faceXYZToUV(c.face, q).foreach { case (u, v) =>
          assert(u >= uLo - 1e-12 && u <= uHi + 1e-12 &&
            v >= vLo - 1e-12 && v <= vHi + 1e-12,
            s"point at ${dist * 0.99} rad escaped expanded rect")
        }
      }
    }
  }
}
