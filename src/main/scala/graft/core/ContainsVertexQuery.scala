package graft.core

/** Tracks the edges entering and leaving a vertex of a polygon to decide
  * whether the vertex itself is contained, under the semi-open boundary
  * model: if several polygons tile the region around a vertex, exactly
  * one contains it (/root/reference/s2/contains_vertex_query.go:15-63).
  *
  * Directions: +1 outgoing edge (target -> v), -1 incoming, 0 degenerate.
  * containsVertex returns +1 contained, -1 not contained, 0 when the
  * incident edges are all matched sibling pairs (undetermined).
  */
final class ContainsVertexQuery(target: Vec3) {
  // Insertion-ordered for deterministic iteration; the result does not
  // depend on order (the scan keeps the edge immediately clockwise from
  // the reference direction regardless of visit order).
  private val edgeMap = scala.collection.mutable.LinkedHashMap[Vec3, Int]()

  def addEdge(v: Vec3, direction: Int): Unit =
    edgeMap.update(v, edgeMap.getOrElse(v, 0) + direction)

  def containsVertex(): Int = {
    // Find the unmatched edge immediately clockwise from referenceDir.
    val refDir = EdgeCrossings.referenceDir(target)
    var bestPoint = refDir
    var bestDir = 0
    for ((k, v) <- edgeMap if v != 0) {
      if (EdgeCrossings.orderedCCW(refDir, bestPoint, k, target)) {
        bestPoint = k
        bestDir = v
      }
    }
    bestDir
  }
}
