package graft.core

/** 1-D vertex chain on the sphere
  * (/root/reference/s2/polyline.go:29-639, polyline_measures.go:28-68).
  */
final class Polyline(val vertices: Array[Vec3]) extends S2Region {

  /** Minimum squared-chord distance to another polyline over all edge
    * pairs (edge_distances.go:334-356 applied chain x chain); 0 when the
    * chains cross.
    */
  def distanceToPolyline(o: Polyline): Double = {
    var best = ChordAngle.Straight
    var i = 1
    while (i < vertices.length && best > 0) {
      var j = 1
      while (j < o.vertices.length && best > 0) {
        val d = EdgeDistances.edgePairMinDistance(
          vertices(i - 1), vertices(i), o.vertices(j - 1), o.vertices(j))
        if (d < best) best = d
        j += 1
      }
      i += 1
    }
    best
  }
  require(vertices.length >= 1)

  def numEdges: Int = math.max(0, vertices.length - 1)

  /** Total arc length in radians (polyline_measures.go:28-37). */
  def length: Double = {
    var sum = 0.0
    var i = 1
    while (i < vertices.length) {
      sum += vertices(i - 1).angle(vertices(i))
      i += 1
    }
    sum
  }

  /** Length-weighted centroid times total length (polyline_measures.go:45-68). */
  def centroidTimesLength: Vec3 = {
    var c = Vec3.zero
    var i = 1
    while (i < vertices.length) {
      // edge centroid = midpoint scaled by edge length
      val mid = (vertices(i - 1) + vertices(i)) * 0.5
      val len = vertices(i - 1).angle(vertices(i))
      if (mid.norm2 > 0) c = c + (mid.normalize * len)
      i += 1
    }
    c
  }

  /** Point at fraction t in [0,1] of total length + its next vertex index
    * (polyline.go Interpolate semantics).
    */
  def interpolate(t: Double): (Vec3, Int) = {
    if (t <= 0) return (vertices(0), 1)
    var target = t * length
    var i = 1
    while (i < vertices.length) {
      val seg = vertices(i - 1).angle(vertices(i))
      // Strict comparison (polyline.go:590): a fraction landing exactly
      // on vertex i reports next = i + 1, not i.
      if (target < seg) {
        val result = EdgeDistances.interpolateAtDistance(target,
          vertices(i - 1), vertices(i))
        // rounding can still land exactly on vertex i
        return if (result == vertices(i)) (result, i + 1) else (result, i)
      }
      target -= seg
      i += 1
    }
    (vertices.last, vertices.length)
  }

  /** Inverse of interpolate: fraction of x's position along the line
    * (polyline.go:616-632).
    */
  def uninterpolate(x: Vec3, nextVertex: Int): Double = {
    if (vertices.length < 2) return 0
    var sum = 0.0
    var i = 1
    while (i < nextVertex) {
      sum += vertices(i - 1).angle(vertices(i))
      i += 1
    }
    val lengthToPoint = sum + vertices(nextVertex - 1).angle(x)
    while (i < vertices.length) {
      sum += vertices(i - 1).angle(vertices(i))
      i += 1
    }
    math.min(1.0, lengthToPoint / sum)
  }

  /** Closest point on the polyline to x + next-vertex index (polyline.go:459+). */
  def project(x: Vec3): (Vec3, Int) = {
    if (vertices.length == 1) return (vertices(0), 1)
    var best = Double.MaxValue
    var bestPoint = vertices(0)
    var bestNext = 1
    var i = 1
    while (i < vertices.length) {
      val p = EdgeDistances.project(x, vertices(i - 1), vertices(i))
      val d = ChordAngle.between(x, p)
      if (d < best) { best = d; bestPoint = p; bestNext = i }
      i += 1
    }
    // A projection landing exactly on the segment's end vertex reports
    // the FOLLOWING edge's index (polyline.go:479-481) — isOnRight's
    // interior-vertex wedge branch depends on this.
    if (bestPoint == vertices(bestNext)) bestNext += 1
    (bestPoint, bestNext)
  }

  /** Whether x is on the right side of the line walking v0 -> vn
    * (polyline.go:491-509).
    */
  def isOnRight(x: Vec3): Boolean = {
    val (closest, next0) = project(x)
    if (closest == vertices(next0 - 1) && next0 > 1 && next0 < vertices.length) {
      if (x == vertices(next0 - 1)) return false // vertices are not on the RHS
      return EdgeCrossings.orderedCCW(vertices(next0 - 2), x, vertices(next0),
        vertices(next0 - 1))
    }
    val next = if (next0 == vertices.length) next0 - 1 else next0
    Predicates.sign(x, vertices(next), vertices(next - 1))
  }

  /** Douglas-Peucker-flavored subsample: keep vertices such that the
    * dropped ones are within tolerance of the simplified chain
    * (polyline.go SubsampleVertices).
    */
  def subsampleVertices(toleranceRad: Double): Array[Int] = {
    if (vertices.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer[Int](0)
    val tol = ChordAngle.fromRadians(math.max(0, toleranceRad))
    var index = 0
    while (index + 1 < vertices.length) {
      val first = index
      var lastGood = index + 1
      var next = index + 1
      var done = false
      while (!done && next + 1 < vertices.length) {
        // can we extend the segment first->next+1 while keeping all dropped
        // vertices within tolerance?
        val cand = next + 1
        var ok = true
        var k = first + 1
        while (ok && k < cand) {
          if (!EdgeDistances.isDistanceLess(vertices(k), vertices(first), vertices(cand), tol))
            ok = false
          k += 1
        }
        if (ok) { lastGood = cand; next = cand } else done = true
      }
      out += lastGood
      index = lastGood
    }
    out.toArray
  }

  // Region interface: bound = rect bound of the chain.
  def rectBound: SphereRect = {
    val rb = new RectBounder
    vertices.foreach(rb.addPoint)
    rb.rectBound
  }
  def capBound: Cap = {
    if (vertices.isEmpty) return Cap.empty
    var c = Cap.fromPoint(vertices(0))
    vertices.foreach(v => c = c.addPoint(v))
    c
  }
  def containsPoint(p: Vec3): Boolean = false // 1-D set: no interior
  def containsCell(cell: Cell): Boolean = false
  def intersectsCell(cell: Cell): Boolean = {
    // conservative-exact: any vertex inside, or any edge crosses a cell edge
    if (vertices.exists(cell.containsPoint)) return true
    val cv = Array.tabulate(4)(cell.vertex)
    var i = 1
    while (i < vertices.length) {
      val crosser = new EdgeCrosser(vertices(i - 1), vertices(i))
      var k = 0
      while (k < 4) {
        if (crosser.crossingSignTo(cv(k), cv((k + 1) & 3)) == EdgeCrossings.Cross)
          return true
        k += 1
      }
      i += 1
    }
    false
  }
  def cellUnionBound: Array[Long] = capBound.cellUnionBound
}

object Polyline {
  def fromLatLngsDegrees(latLngs: Seq[(Double, Double)]): Polyline =
    new Polyline(latLngs.map { case (la, ln) => LatLng.toPointDegrees(la, ln) }.toArray)

  def parse(s: String): Polyline =
    fromLatLngsDegrees(s.split(",").map(_.trim).filter(_.nonEmpty).map { tok =>
      val Array(lat, lng) = tok.split(":").map(_.trim.toDouble)
      (lat, lng)
    }.toSeq)
}
