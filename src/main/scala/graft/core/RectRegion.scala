package graft.core

/** SphereRect as a coverer-ready region with exact cell relation tests
  * (/root/reference/s2/rect.go:226-431).
  */
final case class RectRegion(rect: SphereRect) extends S2Region {

  def centerLat: Double = rect.lat.center
  def centerLng: Double = rect.lng.center

  /** CCW vertex i: (latLo,lngLo),(latLo,lngHi),(latHi,lngHi),(latHi,lngLo). */
  private def vertexLatLng(i: Int): (Double, Double) = i match {
    case 0 => (rect.lat.lo, rect.lng.lo)
    case 1 => (rect.lat.lo, rect.lng.hi)
    case 2 => (rect.lat.hi, rect.lng.hi)
    case _ => (rect.lat.hi, rect.lng.lo)
  }

  def containsPoint(p: Vec3): Boolean = rect.containsPoint(p)

  /** Exact: rect contains cell iff it contains the cell's bound
    * (rect.go:270-281).
    */
  def containsCell(cell: Cell): Boolean = rect.containsRect(cell.rectBound)

  /** Exact rect x cell intersection (rect.go:369-431). */
  def intersectsCell(cell: Cell): Boolean = {
    if (rect.isEmpty) return false
    if (rect.containsPoint(CellId.rawPoint(cell.id))) return true
    if (cell.containsPoint(LatLng.toPoint(centerLat, centerLng))) return true
    if (!rect.intersects(cell.rectBound)) return false

    val vertices = Array.tabulate(4)(cell.vertex)
    val latlngs = vertices.map(v => (LatLng.latitude(v), LatLng.longitude(v)))
    var i = 0
    while (i < 4) {
      if (rect.containsLatLng(latlngs(i)._1, latlngs(i)._2)) return true
      val (vla, vln) = vertexLatLng(i)
      if (cell.containsPoint(LatLng.toPoint(vla, vln))) return true
      i += 1
    }
    i = 0
    while (i < 4) {
      val edgeLng = S1Interval.fromEndpoints(latlngs(i)._2, latlngs((i + 1) & 3)._2)
      if (rect.lng.intersects(edgeLng)) {
        val a = vertices(i)
        val b = vertices((i + 1) & 3)
        if (edgeLng.contains(rect.lng.lo) &&
          RectRegion.intersectsLngEdge(a, b, rect.lat, rect.lng.lo)) return true
        if (edgeLng.contains(rect.lng.hi) &&
          RectRegion.intersectsLngEdge(a, b, rect.lat, rect.lng.hi)) return true
        if (RectRegion.intersectsLatEdge(a, b, rect.lat.lo, rect.lng)) return true
        if (RectRegion.intersectsLatEdge(a, b, rect.lat.hi, rect.lng)) return true
      }
      i += 1
    }
    false
  }

  /** Bounding cap: smaller of pole-axis cap and center-axis cap
    * (rect.go:226-260).
    */
  def capBound: Cap = {
    if (rect.isEmpty) return Cap.empty
    var poleZ = 0.0
    var poleAngle = 0.0
    if (rect.lat.hi + rect.lat.lo < 0) {
      poleZ = -1; poleAngle = math.Pi / 2 + rect.lat.hi
    } else {
      poleZ = 1; poleAngle = math.Pi / 2 - rect.lat.lo
    }
    val poleCap = Cap.fromCenterRadians(Vec3(0, 0, poleZ), poleAngle)
    if (math.IEEEremainder(rect.lng.hi - rect.lng.lo, 2 * math.Pi) >= 0 &&
      rect.lng.hi - rect.lng.lo < 2 * math.Pi) {
      var midCap = Cap.fromPoint(LatLng.toPoint(centerLat, centerLng))
      var k = 0
      while (k < 4) {
        val (vla, vln) = vertexLatLng(k)
        midCap = midCap.addPoint(LatLng.toPoint(vla, vln))
        k += 1
      }
      if (midCap.height < poleCap.height) return midCap
    }
    poleCap
  }

  def rectBound: SphereRect = rect
  def cellUnionBound: Array[Long] = capBound.cellUnionBound
}

object RectRegion {
  def fromDegrees(latLo: Double, lngLo: Double, latHi: Double, lngHi: Double): RectRegion =
    RectRegion(SphereRect.fromDegrees(latLo, lngLo, latHi, lngHi))

  /** Edge AB vs constant-longitude edge: straight geodesics, plain
    * crossing test (rect.go:359-366).
    */
  def intersectsLngEdge(a: Vec3, b: Vec3, lat: R1Interval, lng: Double): Boolean =
    EdgeCrossings.crossingSign(a, b,
      LatLng.toPoint(lat.lo, lng), LatLng.toPoint(lat.hi, lng)) == EdgeCrossings.Cross

  /** Edge AB vs constant-latitude curve: 0, 1, or 2 intersections
    * (rect.go:303-356).
    */
  def intersectsLatEdge(a: Vec3, b: Vec3, lat: Double, lng: S1Interval): Boolean = {
    var z = EdgeCrossings.pointCross(a, b).normalize
    if (z.z < 0) z = z * -1
    val y = EdgeCrossings.pointCross(z, Vec3(0, 0, 1)).normalize
    val x = y.cross(z)

    val sinLat = math.sin(lat)
    if (math.abs(sinLat) >= x.z) return false

    val cosTheta = sinLat / x.z
    val sinTheta = math.sqrt(1 - cosTheta * cosTheta)
    val theta = math.atan2(sinTheta, cosTheta)

    val abTheta = S1Interval.fromPointPair(
      math.atan2(a.dot(y), a.dot(x)),
      math.atan2(b.dot(y), b.dot(x)))

    if (abTheta.contains(theta)) {
      val isect = x * cosTheta + y * sinTheta
      if (lng.contains(math.atan2(isect.y, isect.x))) return true
    }
    if (abTheta.contains(-theta)) {
      val isect = x * cosTheta - y * sinTheta
      if (lng.contains(math.atan2(isect.y, isect.x))) return true
    }
    false
  }
}
