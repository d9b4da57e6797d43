package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The reference's own ContainsVertexQuery protocols
  * (contains_vertex_query_test.go:23-70).
  */
class ContainsVertexQuerySpec extends AnyFunSuite {

  private def pt(lat: Double, lng: Double) = LatLng.toPointDegrees(lat, lng)

  test("matched sibling pair is undetermined") {
    val q = new ContainsVertexQuery(pt(1, 2))
    q.addEdge(pt(3, 4), 1)
    q.addEdge(pt(3, 4), -1)
    assert(q.containsVertex() === 0)
  }

  test("contained with duplicate edges") {
    // Ortho reference direction points approximately due west; the
    // unmatched edge immediately clockwise decides containment.
    val q = new ContainsVertexQuery(pt(0, 0))
    q.addEdge(pt(3, -3), -1)
    q.addEdge(pt(1, -5), 1)
    q.addEdge(pt(2, -4), 1)
    q.addEdge(pt(1, -5), -1)
    assert(q.containsVertex() === 1)
  }

  test("not contained with duplicate edges") {
    val q = new ContainsVertexQuery(pt(1, 1))
    q.addEdge(pt(1, -5), 1)
    q.addEdge(pt(2, -4), -1)
    q.addEdge(pt(3, -3), 1)
    q.addEdge(pt(1, -5), -1)
    assert(q.containsVertex() === -1)
  }

  test("matches Loop containment on a 1000-gon near the pole") {
    val loop = Loop.regularLoop(pt(89, -179),
      math.toRadians(10), 1000)
    for (i <- 1 to loop.numVertices) {
      val q = new ContainsVertexQuery(loop.vertex(i))
      q.addEdge(loop.vertex(i - 1), -1)
      q.addEdge(loop.vertex(i + 1), 1)
      assert((q.containsVertex() > 0) ===
        loop.containsPoint(loop.vertex(i)), s"vertex $i")
    }
  }
}
