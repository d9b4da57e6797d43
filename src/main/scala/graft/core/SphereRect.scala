package graft.core

/** Latitude-longitude rectangle on the sphere: a lat interval (radians,
  * [-Pi/2,Pi/2]) x a circular lng interval; lng may wrap
  * (/root/reference/s2/rect.go:30-295).
  */
final case class SphereRect(lat: R1Interval, lng: S1Interval) {
  import SphereRect._

  def isEmpty: Boolean = lat.isEmpty
  def isFull: Boolean = lat == validLat && lng.isFull

  def addPoint(latRad: Double, lngRad: Double): SphereRect =
    if (math.abs(latRad) > math.Pi / 2 || math.abs(lngRad) > math.Pi) this
    else SphereRect(lat.addPoint(latRad), lng.addPoint(lngRad))

  def containsLatLng(latRad: Double, lngRad: Double): Boolean =
    math.abs(latRad) <= math.Pi / 2 && math.abs(lngRad) <= math.Pi &&
      lat.contains(latRad) && lng.contains(lngRad)

  def containsPoint(p: Vec3): Boolean =
    containsLatLng(LatLng.latitude(p), LatLng.longitude(p))

  def union(o: SphereRect): SphereRect =
    SphereRect(lat.union(o.lat), lng.union(o.lng))

  def intersection(o: SphereRect): SphereRect = {
    val la = lat.intersection(o.lat)
    val ln = lng.intersection(o.lng)
    if (la.isEmpty || ln.isEmpty) empty else SphereRect(la, ln)
  }

  def intersects(o: SphereRect): Boolean =
    lat.intersects(o.lat) && lng.intersects(o.lng)

  def containsRect(o: SphereRect): Boolean =
    lat.containsInterval(o.lat) && lng.containsInterval(o.lng)

  def interiorIntersects(o: SphereRect): Boolean =
    lat.interiorIntersects(o.lat) && lng.interiorIntersects(o.lng)

  /** Expand by margins; lat clamped to valid range (rect.go:172-184). */
  def expanded(latMargin: Double, lngMargin: Double): SphereRect = {
    val la = lat.expanded(latMargin)
    val ln = lng.expanded(lngMargin)
    if (la.isEmpty || ln.isEmpty) empty
    else SphereRect(la.intersection(validLat), ln)
  }

  /** If the rect touches a pole, widen lng to full (rect.go:191-196). */
  def polarClosure: SphereRect =
    if (lat.lo == -math.Pi / 2 || lat.hi == math.Pi / 2)
      SphereRect(lat, S1Interval.full)
    else this

  /** Minimum surface distance (radians) from a point to the rect's
    * boundary+interior (rect.go:466-483).
    */
  def distanceToLatLng(latRad: Double, lngRad: Double): Double = {
    if (lng.contains(lngRad))
      return math.max(0, math.max(latRad - lat.hi, lat.lo - latRad))
    val i = S1Interval.fromEndpoints(lng.hi, lng.complementCenter)
    val rectLng = if (i.contains(lngRad)) lng.hi else lng.lo
    val p = LatLng.toPoint(latRad, lngRad)
    val lo = LatLng.toPoint(lat.lo, rectLng)
    val hi = LatLng.toPoint(lat.hi, rectLng)
    EdgeDistances.distanceFromSegment(p, lo, hi)
  }

  /** Directed Hausdorff distance h(this, other) in radians
    * (rect.go:489-501).
    */
  def directedHausdorffDistance(other: SphereRect): Double = {
    if (isEmpty) return 0
    if (other.isEmpty) return math.Pi
    val lngDiff = lng.directedHausdorffDistance(other.lng)
    SphereRect.directedHausdorffLat(lngDiff, lat, other.lat)
  }

  /** Undirected Hausdorff distance (rect.go:503-510). */
  def hausdorffDistance(other: SphereRect): Double =
    math.max(directedHausdorffDistance(other),
      other.directedHausdorffDistance(this))
}

object SphereRect {
  private[core] val validLat = R1Interval(-math.Pi / 2, math.Pi / 2)

  /** Directed Hausdorff distance from a longitudinal edge spanning
    * latitudes `a` to another spanning `b`, separated by lngDiff
    * (rect.go:521-601): cases split by which Voronoi regions of edge b
    * the longitude-0 line intersects.
    */
  private[core] def directedHausdorffLat(lngDiff: Double, a: R1Interval,
                                         b: R1Interval): Double = {
    require(lngDiff >= 0 && lngDiff <= math.Pi, "bad lngDiff")
    if (lngDiff == 0) return a.directedHausdorffDistance(b)

    val bLng = lngDiff
    val bLo = LatLng.toPoint(b.lo, bLng)
    val bHi = LatLng.toPoint(b.hi, bLng)
    val aLo = LatLng.toPoint(a.lo, 0)
    val aHi = LatLng.toPoint(a.hi, 0)
    var maxDistance = math.max(
      EdgeDistances.distanceFromSegment(aLo, bLo, bHi),
      EdgeDistances.distanceFromSegment(aHi, bLo, bHi))

    if (lngDiff <= math.Pi / 2) {
      if (a.contains(0) && b.contains(0))
        maxDistance = math.max(maxDistance, lngDiff)
      return maxDistance
    }

    val p = bisectorIntersection(b, bLng)
    val pLat = LatLng.latitude(p)
    if (a.contains(pLat))
      maxDistance = math.max(maxDistance, p.angle(bLo))
    if (pLat > a.lo) {
      interiorMaxDistance(R1Interval(a.lo, math.min(pLat, a.hi)), bLo)
        .foreach(d => maxDistance = math.max(maxDistance, d))
    }
    if (pLat < a.hi) {
      interiorMaxDistance(R1Interval(math.max(pLat, a.lo), a.hi), bHi)
        .foreach(d => maxDistance = math.max(maxDistance, d))
    }
    maxDistance
  }

  /** Max distance from b to the lat range aLat on longitude 0 when the
    * max is interior (rect.go:603-620).
    */
  private def interiorMaxDistance(aLat: R1Interval, b: Vec3): Option[Double] = {
    if (aLat.isEmpty || b.x >= 0) return None
    val ip = Vec3(-b.x, 0, -b.z).normalize
    if (!aLat.interiorContains(LatLng.latitude(ip))) None
    else Some(b.angle(ip))
  }

  /** Intersection of longitude 0 with the bisector of an edge on
    * longitude lng spanning latitudes lat (rect.go:622-640).
    */
  private def bisectorIntersection(lat: R1Interval, lng0: Double): Vec3 = {
    val lng = math.abs(lng0)
    val latCenter = lat.center
    val orthoBisector =
      if (latCenter < 0) LatLng.toPoint(-latCenter - math.Pi / 2, lng - math.Pi)
      else LatLng.toPoint(latCenter - math.Pi / 2, lng)
    val orthoLng = Vec3(0, -1, 0)
    EdgeCrossings.pointCross(orthoLng, orthoBisector).normalize
  }
  val empty: SphereRect = SphereRect(R1Interval.empty, S1Interval.empty)
  val full: SphereRect = SphereRect(validLat, S1Interval.full)

  def fromLatLng(latRad: Double, lngRad: Double): SphereRect =
    SphereRect(R1Interval(latRad, latRad), S1Interval(lngRad, lngRad))

  /** From degrees, with lo/hi corners (test convenience). */
  def fromDegrees(latLo: Double, lngLo: Double, latHi: Double, lngHi: Double): SphereRect =
    SphereRect(
      R1Interval(latLo * LatLng.DegToRad, latHi * LatLng.DegToRad),
      S1Interval.fromEndpoints(
        math.IEEEremainder(lngLo * LatLng.DegToRad, 2 * math.Pi),
        math.IEEEremainder(lngHi * LatLng.DegToRad, 2 * math.Pi)))
}

/** Conservative lat/lng bound of an edge chain; handles edges whose
  * latitude extremum falls in the interior, near-antipodal jumps, and
  * pole-touching chains (/root/reference/s2/rect_bounder.go:15-216).
  */
final class RectBounder {
  import Predicates.MachineEps

  private var a: Vec3 = Vec3.zero
  private var aLat = 0.0
  private var aLng = 0.0
  private var bound: SphereRect = SphereRect.empty

  def addPoint(b: Vec3): Unit = {
    val bLat = LatLng.latitude(b)
    val bLng = LatLng.longitude(b)
    if (bound.isEmpty) {
      a = b; aLat = bLat; aLng = bLng
      bound = bound.addPoint(bLat, bLng)
      return
    }

    // Robust normal N = 2*(A x B) via difference-sum cross product.
    val n = (a - b).cross(a + b)
    val nNorm = n.norm
    if (nNorm < 1.91346e-15) {
      // Nearly identical or nearly antipodal endpoints.
      if (a.dot(b) < 0) bound = SphereRect.full
      else bound = bound.union(
        SphereRect.fromLatLng(aLat, aLng).addPoint(bLat, bLng))
      a = b; aLat = bLat; aLng = bLng
      return
    }

    var lngAB = S1Interval.empty.addPoint(aLng).addPoint(bLng)
    if (lngAB.length >= math.Pi - 2 * MachineEps) lngAB = S1Interval.full

    var latAB = R1Interval.fromPoint(aLat).addPoint(bLat)

    // Does AB cross the plane through N and the Z-axis (lat extremum)?
    val m = n.cross(Vec3(0, 0, 1))
    val mA = m.dot(a)
    val mB = m.dot(b)
    val mError = 6.06638e-16 * nNorm + 6.83174e-31
    if (mA * mB < 0 || math.abs(mA) <= mError || math.abs(mB) <= mError) {
      val maxLat = math.min(
        math.atan2(math.sqrt(n.x * n.x + n.y * n.y), math.abs(n.z)) + 3 * MachineEps,
        math.Pi / 2)
      val latBudget = 2 * math.asin(0.5 * (a - b).norm * math.sin(maxLat))
      val maxDelta = 0.5 * (latBudget - latAB.length) + MachineEps
      if (mA <= mError && mB >= -mError)
        latAB = R1Interval(latAB.lo, math.min(maxLat, latAB.hi + maxDelta))
      if (mB <= mError && mA >= -mError)
        latAB = R1Interval(math.max(-maxLat, latAB.lo - maxDelta), latAB.hi)
    }
    a = b; aLat = bLat; aLng = bLng
    bound = bound.union(SphereRect(latAB, lngAB))
  }

  def rectBound: SphereRect =
    bound.expanded(2 * MachineEps, 0).polarClosure
}

object RectBounder {
  import Predicates.MachineEps

  /** Expand so the bound of any contained subregion is contained
    * (rect_bounder.go:220-351).
    */
  def expandForSubregions(bound: SphereRect): SphereRect = {
    if (bound.isEmpty) return bound
    val lngGap = math.max(0, math.Pi - bound.lng.length - 2.5 * MachineEps)
    val minAbsLat = math.max(bound.lat.lo, -bound.lat.hi)
    val latGapSouth = math.Pi / 2 + bound.lat.lo
    val latGapNorth = math.Pi / 2 - bound.lat.hi
    if (minAbsLat >= 0) {
      if (2 * minAbsLat + lngGap < 1.354e-15) return SphereRect.full
    } else if (lngGap >= math.Pi / 2) {
      if (latGapSouth + latGapNorth < 1.687e-15) return SphereRect.full
    } else {
      if (math.max(latGapSouth, latGapNorth) * lngGap < 1.765e-15)
        return SphereRect.full
    }
    val latExpansion = 9 * MachineEps
    val lngExpansion = if (lngGap <= 0) math.Pi else 0.0
    bound.expanded(latExpansion, lngExpansion).polarClosure
  }
}
