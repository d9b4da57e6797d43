package graft.core

/** Convex hull of points on the sphere — the reference's ConvexHullQuery
  * algorithm (/root/reference/s2/convex_hull_query.go:60-258): points are
  * sorted CCW around an origin derived from the bounding cap's axis (so
  * the angular order is monotone and every point lies on one side of a
  * geodesic through the origin), then Andrew's monotone chain runs twice
  * with RobustSign as the turn test.
  *
  * A raw 3-D lexicographic sort (the r1 implementation) is NOT a valid
  * monotone order for the spherical chain: for wide point spreads the
  * coordinate order disagrees with the orientation test and interior
  * points survive into the "hull".
  */
object ConvexHull {

  /** Hull loop: empty loop for no points, full loop when the geometry
    * spans more than a hemisphere, tiny 3-vertex loops for the 1- and
    * 2-point cases (convex_hull_query.go:139-258).
    */
  def hullLoop(points: Seq[Vec3]): Loop = {
    if (points.isEmpty) return Loop.empty
    var bound = SphereRect.empty
    points.foreach(p => bound = bound.addPoint(LatLng.latitude(p), LatLng.longitude(p)))
    val cap = RectRegion(bound).capBound
    if (cap.height >= 1) return Loop.full

    val pts = points.distinct.toArray
    // CCW sort around an origin definitely outside the hull.
    val origin = cap.center.ortho
    val sorted = pts.sortWith((a, b) =>
      Predicates.robustSign(origin, a, b) == Predicates.CounterClockwise)

    sorted.length match {
      case 0 => Loop.empty
      case 1 => singlePointLoop(sorted(0))
      case 2 => singleEdgeLoop(sorted(0), sorted(1))
      case _ =>
        val lower = monotoneChain(sorted)
        val upper = monotoneChain(sorted.reverse)
        Loop.fromPoints((lower.dropRight(1) ++ upper.dropRight(1)).toArray)
    }
  }

  /** Hull vertices (CCW); empty/full/degenerate cases per hullLoop. */
  def hull(points: Seq[Vec3]): Array[Vec3] = hullLoop(points).vertices

  /** Maximal subset making only left (CCW) turns
    * (convex_hull_query.go:208-219).
    */
  private def monotoneChain(pts: Array[Vec3]): scala.collection.mutable.ArrayBuffer[Vec3] = {
    val out = scala.collection.mutable.ArrayBuffer[Vec3]()
    for (p <- pts) {
      while (out.length >= 2 &&
        Predicates.robustSign(out(out.length - 2), out(out.length - 1), p)
          != Predicates.CounterClockwise) {
        out.remove(out.length - 1)
      }
      out += p
    }
    out
  }

  /** 3-vertex sliver around a single point (convex_hull_query.go:221-233). */
  private def singlePointLoop(p: Vec3): Loop = {
    val offset = 1e-15
    val d0 = p.ortho
    val d1 = p.cross(d0)
    Loop.fromPoints(Array(p,
      (p + d0 * offset).normalize,
      (p + d1 * offset).normalize))
  }

  /** Two vertices plus their midpoint; antipodal pairs yield the full
    * loop (convex_hull_query.go:235-258).
    */
  private def singleEdgeLoop(a: Vec3, b: Vec3): Loop = {
    if (a + b == Vec3.zero) return Loop.full
    val loop = Loop.fromPoints(Array(a, b, EdgeDistances.interpolate(0.5, a, b)))
    loop.normalized
  }
}
