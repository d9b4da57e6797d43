package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The canonical crossing truth table (edge_crosser_test.go
  * TestEdgeCrosserCrossings): 12 cases from regular crossings through
  * subnormal 1e-323 coordinates whose exact determinants need thousands
  * of bits, each checked under vertex-order permutations, degenerate
  * collapses, self-crossing, and both the stateless and stateful
  * (chain) crosser paths.
  */
class EdgeCrosserProtocolSpec extends AnyFunSuite {
  import EdgeCrossings.{Cross, DoNotCross, MaybeCross}

  private val na1 = math.nextAfter(1.0, 0.0)
  private val na2 = math.nextAfter(1.0, 2.0)

  private def v(x: Double, y: Double, z: Double) = Vec3(x, y, z).normalize

  private def checkCrossing(msg: String, a: Vec3, b: Vec3, c: Vec3, d: Vec3,
                            robust0: Int, edgeOrVertex0: Boolean): Unit = {
    // two identical vertices from different edges force MaybeCross
    val robust =
      if (a == c || a == d || b == c || b == d) MaybeCross else robust0
    val edgeOrVertex =
      if (robust == MaybeCross && robust0 != MaybeCross)
        EdgeCrossings.vertexCrossing(a, b, c, d)
      else edgeOrVertex0
    assert(EdgeCrossings.crossingSign(a, b, c, d) === robust, s"$msg: sign")
    assert(EdgeCrossings.edgeOrVertexCrossing(a, b, c, d) === edgeOrVertex,
      s"$msg: edgeOrVertex")
    // stateful chain crosser must agree on repeated targets
    val crosser = new EdgeCrosser(a, b)
    assert(crosser.crossingSignTo(c, d) === robust, s"$msg: chain d")
    assert(crosser.crossingSignTo(d, c) === robust, s"$msg: chain c")
  }

  private def sweep(msg: String, a0: Vec3, b0: Vec3, c0: Vec3, d0: Vec3,
                    robust: Int, edgeOrVertex: Boolean): Unit = {
    val (a, b, c, d) = (a0, b0, c0, d0)
    checkCrossing(msg, a, b, c, d, robust, edgeOrVertex)
    checkCrossing(msg, b, a, c, d, robust, edgeOrVertex)
    checkCrossing(msg, a, b, d, c, robust, edgeOrVertex)
    checkCrossing(msg, b, a, d, c, robust, edgeOrVertex)
    // degenerate collapses never cross
    checkCrossing(msg, a, a, c, d, DoNotCross, false)
    checkCrossing(msg, a, b, c, c, DoNotCross, false)
    checkCrossing(msg, a, a, c, c, DoNotCross, false)
    // an edge against itself is a vertex crossing
    checkCrossing(msg, a, b, a, b, MaybeCross, true)
  }

  test("crossing truth table incl. subnormal near-misses") {
    val origin = EdgeCrossings.originPoint
    sweep("two regular edges that cross",
      v(1, 2, 1), v(1, -3, 0.5), v(1, -0.5, -3), v(0.1, 0.5, 3),
      Cross, edgeOrVertex = true)
    sweep("regular edges intersecting antipodal points",
      v(1, 2, 1), v(1, -3, 0.5), v(-1, 0.5, 3), v(-0.1, -0.5, -3),
      DoNotCross, edgeOrVertex = false)
    sweep("same great circle starting at antipodal points",
      v(0, 0, -1), v(0, 1, 0), v(0, 0, 1), v(0, 1, 1),
      DoNotCross, edgeOrVertex = false)
    sweep("crossing where one vertex is the origin",
      v(1, 0, 0), origin, v(1, -0.1, 1), v(1, 1, -0.1),
      Cross, edgeOrVertex = true)
    sweep("antipodal intersection with an origin vertex",
      v(1, 0, 0), origin, v(1, 0.1, -1), v(1, 1, -0.1),
      DoNotCross, edgeOrVertex = false)
    sweep("edges crossing antipodal points",
      v(1, 0, 0), v(0, 1, 0), v(0, 0, -1), v(-1, -1, 1),
      DoNotCross, edgeOrVertex = false)
    sweep("edges sharing an endpoint",
      v(2, 3, 4), v(-1, 2, 5), v(7, -2, 3), v(2, 3, 4),
      MaybeCross, edgeOrVertex = false)
    sweep("barely crossing near the middle of one edge",
      v(1, 1, 1), v(1, na1, -1), v(11, -12, -1), v(10, 10, 1),
      Cross, edgeOrVertex = true)
    sweep("barely crossing near the middle, separated by ~1e-15",
      v(1, 1, 1), v(1, na2, -1), v(1, -1, 0), v(1, 1, 0),
      DoNotCross, edgeOrVertex = false)
    sweep("barely crossing near the ends (float underflow)",
      v(0, 0, 1), v(2, -1e-323, 1), v(1, -1, 1), v(1e-323, 0, 1),
      Cross, edgeOrVertex = true)
    sweep("barely missing near the ends, separated by ~1e-640",
      v(0, 0, 1), v(2, 1e-323, 1), v(1, -1, 1), v(1e-323, 0, 1),
      DoNotCross, edgeOrVertex = false)
    sweep("crossing needing >2000 bits of determinant precision",
      v(1, -1e-323, -1e-323), v(1e-323, 1, 1e-323), v(1, -1, 1e-323),
      v(1, 1, 0), Cross, edgeOrVertex = true)
    sweep("missing by ~1e-640 near the middle",
      v(1, 1e-323, -1e-323), v(-1e-323, 1, 1e-323), v(1, -1, 1e-323),
      v(1, 1, 0), DoNotCross, edgeOrVertex = false)
  }
}
