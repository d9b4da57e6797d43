package graft.core

/** Convex hull of points on the sphere via Andrew's monotone chain run in
  * a tangent-plane-free form using robust orientation tests
  * (/root/reference/s2/convex_hull_query.go:60-258).
  *
  * Returns the hull as a CCW loop. Assumes the points fit in an open
  * hemisphere (true for any bounded region set; the reference handles the
  * degenerate full-sphere cases separately and so do we).
  */
object ConvexHull {

  /** CCW hull loop of the given points; degenerate inputs yield a loop
    * with fewer than 3 vertices (empty for 0, single point, or pair).
    */
  def hull(points: Seq[Vec3]): Array[Vec3] = {
    val pts = points.distinct.toArray
    if (pts.length < 3) return pts

    // Sort in a deterministic lexicographic order (the monotone chain's
    // x-order analogue; any total order works with robust orientation).
    val sorted = pts.sortWith { (a, b) =>
      if (a.x != b.x) a.x < b.x
      else if (a.y != b.y) a.y < b.y
      else a.z < b.z
    }

    // Build lower and upper chains with RobustSign as the turn test.
    def buildChain(seq: Array[Vec3]): scala.collection.mutable.ArrayBuffer[Vec3] = {
      val chain = scala.collection.mutable.ArrayBuffer[Vec3]()
      for (p <- seq) {
        while (chain.length >= 2 &&
          Predicates.robustSign(chain(chain.length - 2), chain(chain.length - 1), p)
            != Predicates.CounterClockwise) {
          chain.remove(chain.length - 1)
        }
        chain += p
      }
      chain
    }

    val lower = buildChain(sorted)
    val upper = buildChain(sorted.reverse)
    // drop last of each (duplicate endpoints)
    (lower.dropRight(1) ++ upper.dropRight(1)).toArray
  }

  def hullLoop(points: Seq[Vec3]): Loop = {
    val h = hull(points)
    if (h.length < 3) Loop.empty else Loop.fromPoints(h)
  }
}
