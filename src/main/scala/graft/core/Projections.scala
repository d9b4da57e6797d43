package graft.core

/** Sphere <-> plane projections with x-wraparound
  * (/root/reference/s2/projections.go:24-241) plus slippy-map (XYZ) tile
  * arithmetic built on the Mercator projection.
  */
sealed trait Projection extends Serializable {
  def xWrap: Double
  /** (lat,lng) radians -> projected (x, y). */
  def fromLatLng(latRad: Double, lngRad: Double): (Double, Double)
  /** projected (x, y) -> (lat,lng) radians. */
  def toLatLng(x: Double, y: Double): (Double, Double)

  def project(p: Vec3): (Double, Double) =
    fromLatLng(LatLng.latitude(p), LatLng.longitude(p))
  def unproject(x: Double, y: Double): Vec3 = {
    val (lat, lng) = toLatLng(x, y)
    LatLng.toPoint(lat, lng)
  }

  def interpolate(f: Double, ax: Double, ay: Double, bx: Double, by: Double): (Double, Double) =
    (ax * (1 - f) + bx * f, ay * (1 - f) + by * f)

  /** Wrap b's x if needed so edge a->b takes the short way around
    * (projections.go:228-241).
    */
  def wrapDestination(ax: Double, bx: Double): Double =
    if (xWrap > 0 && math.abs(bx - ax) > 0.5 * xWrap)
      ax + math.IEEEremainder(bx - ax, xWrap)
    else bx
}

/** Linear lat/lng projection (projections.go:76-146). */
final case class PlateCarreeProjection(maxLng: Double) extends Projection {
  val xWrap: Double = 2 * maxLng
  private val fromRad = maxLng / math.Pi
  private val toRad = math.Pi / maxLng

  def fromLatLng(latRad: Double, lngRad: Double): (Double, Double) =
    (fromRad * lngRad, fromRad * latRad)

  def toLatLng(x: Double, y: Double): (Double, Double) =
    (toRad * y, toRad * math.IEEEremainder(x, xWrap))
}

/** Spherical (Web) Mercator (projections.go:148-226). */
final case class MercatorProjection(maxLng: Double) extends Projection {
  val xWrap: Double = 2 * maxLng
  private val fromRad = maxLng / math.Pi
  private val toRad = math.Pi / maxLng

  def fromLatLng(latRad: Double, lngRad: Double): (Double, Double) = {
    val sinPhi = math.sin(latRad)
    val y = 0.5 * math.log((1 + sinPhi) / (1 - sinPhi))
    (fromRad * lngRad, fromRad * y)
  }

  def toLatLng(x: Double, y: Double): (Double, Double) = {
    val lng = toRad * math.IEEEremainder(x, xWrap)
    val k = math.exp(2 * toRad * y)
    val lat =
      if (k.isInfinity) math.Pi / 2
      else math.asin((k - 1) / (k + 1))
    (lat, lng)
  }
}

/** Web-Mercator XYZ ("slippy map") tiles at integer zoom levels; the
  * raster side of raster<->vector tiling. Tile (x, y, z) covers an exact
  * lat/lng rectangle, which ties tiles back to S2 cell coverings.
  */
object WebMercator {
  /** Tile x index of a longitude at zoom z (standard slippy formula). */
  def tileX(lngDeg: Double, zoom: Int): Long = {
    val n = (1L << zoom).toDouble
    val t = math.floor((lngDeg + 180.0) / 360.0 * n).toLong
    math.max(0L, math.min((1L << zoom) - 1, t))
  }

  /** Tile y index of a latitude at zoom z. */
  def tileY(latDeg: Double, zoom: Int): Long = {
    val n = (1L << zoom).toDouble
    val latRad = math.toRadians(latDeg)
    val t = math.floor(
      (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi)
        / 2.0 * n).toLong
    math.max(0L, math.min((1L << zoom) - 1, t))
  }

  /** Packed tile key: zoom in the top bits, then x, y. */
  def tileKey(lngDeg: Double, latDeg: Double, zoom: Int): Long =
    (zoom.toLong << 58) | (tileX(lngDeg, zoom) << 29) | tileY(latDeg, zoom)

  def keyZoom(key: Long): Int = (key >>> 58).toInt
  def keyX(key: Long): Long = (key >>> 29) & ((1L << 29) - 1)
  def keyY(key: Long): Long = key & ((1L << 29) - 1)

  /** West edge longitude of tile x at zoom. */
  def tileWestDeg(x: Long, zoom: Int): Double =
    x.toDouble / (1L << zoom).toDouble * 360.0 - 180.0

  /** North edge latitude of tile y at zoom (y grows southward). */
  def tileNorthDeg(y: Long, zoom: Int): Double = {
    val n = math.Pi - 2.0 * math.Pi * y.toDouble / (1L << zoom).toDouble
    math.toDegrees(math.atan(math.sinh(n)))
  }

  /** The exact lat/lng rectangle of tile (x, y, z): vector-side region of
    * the raster tile.
    */
  def tileRect(x: Long, y: Long, zoom: Int): RectRegion = {
    val west = tileWestDeg(x, zoom)
    val east = tileWestDeg(x + 1, zoom)
    val north = tileNorthDeg(y, zoom)
    val south = tileNorthDeg(y + 1, zoom)
    RectRegion.fromDegrees(south, west, north, east)
  }

  /** S2 cell covering of a raster tile (raster -> vector direction). */
  def tileCovering(x: Long, y: Long, zoom: Int, maxCells: Int = 8): CellUnion =
    RegionCoverer(maxCells = maxCells).covering(tileRect(x, y, zoom))

  /** Tiles intersecting an S2 cell (vector -> raster direction): scan the
    * tile grid range of the cell's lat/lng bound.
    */
  def cellTiles(cellId: Long, zoom: Int): Array[Long] = {
    val bound = Cell.fromId(cellId).rectBound
    val latLo = bound.lat.lo * LatLng.RadToDeg
    val latHi = bound.lat.hi * LatLng.RadToDeg
    val lngLo = bound.lng.lo * LatLng.RadToDeg
    val lngHi = bound.lng.hi * LatLng.RadToDeg
    val xLo = tileX(lngLo, zoom)
    val xHi = tileX(math.nextDown(lngHi), zoom)
    val yLo = tileY(math.nextDown(latHi), zoom)
    val yHi = tileY(latLo, zoom)
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val region = CellRegion(Cell.fromId(cellId))
    var x = xLo
    while (x <= xHi) {
      var yy = yLo
      while (yy <= yHi) {
        // exact check: does the tile rect intersect the cell?
        if (tileRect(x, yy, zoom).intersectsCell(Cell.fromId(cellId)))
          out += ((zoom.toLong << 58) | (x << 29) | yy)
        yy += 1
      }
      x += 1
    }
    out.toArray
  }
}

/** Geodesic <-> projected edge densification
  * (/root/reference/s2/edge_tessellator.go:15-291). Splits edges
  * recursively until the midpoint error is within tolerance.
  */
final class EdgeTessellator(proj: Projection, toleranceRad: Double) extends Serializable {
  private val tol = math.max(toleranceRad, 1e-13)

  /** Append the projected form of geodesic edge (a, b) to `out`
    * (excluding the projection of a, matching AppendProjected semantics).
    */
  def appendProjected(a: Vec3, b: Vec3, out: scala.collection.mutable.ArrayBuffer[(Double, Double)]): Unit = {
    val pa = proj.project(a)
    if (out.isEmpty) out += pa
    val pb0 = proj.project(b)
    val pb = (proj.wrapDestination(pa._1, pb0._1), pb0._2)
    split(a, pa, b, pb, out)
  }

  private def split(a: Vec3, pa: (Double, Double), b: Vec3, pb: (Double, Double),
                    out: scala.collection.mutable.ArrayBuffer[(Double, Double)]): Unit = {
    // midpoint of geodesic vs midpoint of projected segment
    val mid = (a + b).normalize
    val pmidProj = proj.project(mid)
    val pmidSeg = proj.interpolate(0.5, pa._1, pa._2, pb._1, pb._2)
    val testPoint = proj.unproject(pmidSeg._1, pmidSeg._2)
    if (mid.angle(testPoint) <= tol) {
      out += pb
    } else {
      val pm = (proj.wrapDestination(pa._1, pmidProj._1), pmidProj._2)
      split(a, pa, mid, pm, out)
      split(mid, pm, b, pb, out)
    }
  }
}
