package graft.core

/** Lat/lng in radians with conversions to/from unit-sphere points.
  *
  * Formulas match the reference (/root/reference/s2/latlng.go:85-110);
  * static double-math only so Catalyst codegen can call these directly.
  */
object LatLng {
  val DegToRad: Double = math.Pi / 180.0
  val RadToDeg: Double = 180.0 / math.Pi

  /** (lat,lng) radians -> unit sphere point (latlng.go:88-95). */
  def toPoint(latRad: Double, lngRad: Double): Vec3 = {
    val cosphi = math.cos(latRad)
    Vec3(math.cos(lngRad) * cosphi, math.sin(lngRad) * cosphi, math.sin(latRad))
  }

  def toPointDegrees(latDeg: Double, lngDeg: Double): Vec3 =
    toPoint(latDeg * DegToRad, lngDeg * DegToRad)

  /** Latitude of a point, radians (latlng.go:76-78). */
  def latitude(p: Vec3): Double =
    math.atan2(p.z, math.sqrt(p.x * p.x + p.y * p.y))

  /** Longitude of a point, radians (latlng.go:80-82). */
  def longitude(p: Vec3): Double = math.atan2(p.y, p.x)

  /** Haversine angle between two lat/lngs, radians (latlng.go:61-69). */
  def distance(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val dlat = math.sin(0.5 * (lat2 - lat1))
    val dlng = math.sin(0.5 * (lng2 - lng1))
    val x = dlat * dlat + dlng * dlng * math.cos(lat1) * math.cos(lat2)
    2 * math.atan2(math.sqrt(x), math.sqrt(math.max(0, 1 - x)))
  }

  /** Squared chord length between two unit points, capped at 4
    * (the ChordAngle currency; s2/point.go:141-143).
    */
  def chordAngle2(a: Vec3, b: Vec3): Double =
    math.min(4.0, (a - b).norm2)

  /** ChordAngle from an angle in radians (s1/chordangle.go). */
  def chordAngleFromRadians(rad: Double): Double = {
    if (rad < 0) -1.0
    else {
      val l = 2 * math.sin(0.5 * math.min(math.Pi, rad))
      l * l
    }
  }

  /** Angle in radians from a ChordAngle (squared chord length). */
  def chordAngleToRadians(ca: Double): Double = {
    if (ca < 0) -1.0
    else 2 * math.asin(0.5 * math.sqrt(math.min(4.0, ca)))
  }
}

/** Earth unit conversions (/root/reference/earth/earth.go:44-96). */
object Earth {
  /** Mean radius in meters (earth.go: Radius = 6371.01 km). */
  val RadiusMeters: Double = 6371010.0

  def angleFromMeters(m: Double): Double = m / RadiusMeters
  def metersFromAngle(rad: Double): Double = rad * RadiusMeters
}
