package graft.core

/** Geometric cell: a cell id plus its exact (u,v)-rectangle on its face
  * (/root/reference/s2/cell.go:59-500). A Cell is a closed point set.
  */
final case class Cell(id: Long, face: Int, level: Int,
                      uLo: Double, uHi: Double, vLo: Double, vHi: Double) {
  import Predicates.MachineEps

  /** CCW vertex k (0=lower-left in UV), normalized (cell.go:117-125). */
  def vertex(k: Int): Vec3 = vertexRaw(k).normalize

  def vertexRaw(k: Int): Vec3 = k match {
    case 0 => STUV.faceUVToXYZ(face, uLo, vLo)
    case 1 => STUV.faceUVToXYZ(face, uHi, vLo)
    case 2 => STUV.faceUVToXYZ(face, uHi, vHi)
    case _ => STUV.faceUVToXYZ(face, uLo, vHi)
  }

  /** Inward normal of edge k->k+1, exact (cell.go:145-156). */
  def edgeRaw(k: Int): Vec3 = k match {
    case 0 => STUV.vNorm(face, vLo)          // bottom
    case 1 => STUV.uNorm(face, uHi)          // right
    case 2 => STUV.vNorm(face, vHi) * -1.0   // top
    case _ => STUV.uNorm(face, uLo) * -1.0   // left
  }

  def edge(k: Int): Vec3 = edgeRaw(k).normalize

  /** Closed containment incl. boundary (cell.go:462-491). */
  def containsPoint(p: Vec3): Boolean = {
    STUV.faceXYZToUV(face, p) match {
      case None => false
      case Some((u, v)) =>
        val m = (1.125 + MachineEps) * MachineEps
        u >= uLo - m && u <= uHi + m && v >= vLo - m && v <= vHi + m
    }
  }

  def center: Vec3 = CellId.toPoint(id)

  private def latitudeAt(i: Int, j: Int): Double = {
    val u = if (i == 0) uLo else uHi
    val v = if (j == 0) vLo else vHi
    LatLng.latitude(STUV.faceUVToXYZ(face, u, v))
  }

  private def longitudeAt(i: Int, j: Int): Double = {
    val u = if (i == 0) uLo else uHi
    val v = if (j == 0) vLo else vHi
    LatLng.longitude(STUV.faceUVToXYZ(face, u, v))
  }

  /** Conservative lat/lng bound (cell.go:361-444). */
  def rectBound: SphereRect = {
    if (level > 0) {
      val u = uLo + uHi
      val v = vLo + vHi
      var i = 0; var j = 0
      if (STUV.uAxis(face).z == 0) { if (u < 0) i = 1 } else if (u > 0) i = 1
      if (STUV.vAxis(face).z == 0) { if (v < 0) j = 1 } else if (v > 0) j = 1
      val lat = R1Interval.fromPoint(latitudeAt(i, j)).addPoint(latitudeAt(1 - i, 1 - j))
      val lng = S1Interval.empty.addPoint(longitudeAt(i, 1 - j)).addPoint(longitudeAt(1 - i, j))
      SphereRect(lat, lng).expanded(2 * MachineEps, 2 * MachineEps).polarClosure
    } else {
      val poleMinLat = math.asin(math.sqrt(1.0 / 3)) - 0.5 * MachineEps
      val bound = face match {
        case 0 => SphereRect(R1Interval(-math.Pi / 4, math.Pi / 4),
          S1Interval(-math.Pi / 4, math.Pi / 4))
        case 1 => SphereRect(R1Interval(-math.Pi / 4, math.Pi / 4),
          S1Interval(math.Pi / 4, 3 * math.Pi / 4))
        case 2 => SphereRect(R1Interval(poleMinLat, math.Pi / 2), S1Interval.full)
        case 3 => SphereRect(R1Interval(-math.Pi / 4, math.Pi / 4),
          S1Interval(3 * math.Pi / 4, -3 * math.Pi / 4))
        case 4 => SphereRect(R1Interval(-math.Pi / 4, math.Pi / 4),
          S1Interval(-3 * math.Pi / 4, -math.Pi / 4))
        case _ => SphereRect(R1Interval(-math.Pi / 2, -poleMinLat), S1Interval.full)
      }
      bound.expanded(MachineEps, 0)
    }
  }

  /** Bounding cap via the UV-center axis (cell.go:444-455). */
  def capBound: Cap = {
    var c = Cap.fromPoint(
      STUV.faceUVToXYZ(face, 0.5 * (uLo + uHi), 0.5 * (vLo + vHi)).normalize)
    var k = 0
    while (k < 4) { c = c.addPoint(vertex(k)); k += 1 }
    c
  }
}

object Cell {
  def fromId(id: Long): Cell = {
    val (f, i, j, _) = CellId.faceIJOrientation(id)
    val lvl = CellId.level(id)
    val (uLo, uHi, vLo, vHi) = CellId.ijLevelToBoundUV(i, j, lvl)
    Cell(id, f, lvl, uLo, uHi, vLo, vHi)
  }

  def fromPoint(p: Vec3): Cell = fromId(CellId.fromPoint(p.x, p.y, p.z))
}

/** Cell as a region (region.go implementors). */
final case class CellRegion(cell: Cell) extends S2Region {
  def capBound: Cap = cell.capBound
  def rectBound: SphereRect = cell.rectBound
  def containsCell(other: Cell): Boolean = CellId.contains(cell.id, other.id)
  def intersectsCell(other: Cell): Boolean = CellId.intersects(cell.id, other.id)
  def containsPoint(p: Vec3): Boolean = cell.containsPoint(p)
  def cellUnionBound: Array[Long] = Array(cell.id)
}

/** Spherical disc: center + chord-angle radius
  * (/root/reference/s2/cap.go:67-445).
  */
final case class Cap(center: Vec3, radius: Double) extends S2Region {
  def isEmpty: Boolean = radius < 0
  def isFull: Boolean = radius == ChordAngle.Straight
  def height: Double = 0.5 * radius
  def radiusRadians: Double = ChordAngle.toRadians(radius)

  def containsPoint(p: Vec3): Boolean =
    ChordAngle.between(center, p) <= radius

  def interiorContainsPoint(p: Vec3): Boolean =
    isFull || ChordAngle.between(center, p) < radius

  def containsCap(o: Cap): Boolean =
    isFull || o.isEmpty ||
      radius >= ChordAngle.add(ChordAngle.between(center, o.center), o.radius)

  def intersectsCap(o: Cap): Boolean =
    !isEmpty && !o.isEmpty &&
      ChordAngle.add(radius, o.radius) >= ChordAngle.between(center, o.center)

  def addPoint(p: Vec3): Cap = {
    if (isEmpty) Cap(p, 0)
    else {
      val newRad = ChordAngle.between(center, p)
      if (newRad > radius) Cap(center, newRad) else this
    }
  }

  def addCap(o: Cap): Cap =
    if (isEmpty) o
    else if (o.isEmpty) this
    else {
      val r = ChordAngle.add(ChordAngle.between(center, o.center), o.radius)
      if (r > radius) Cap(center, r) else this
    }

  def expanded(distanceRad: Double): Cap =
    if (isEmpty) Cap.empty
    else Cap(center, ChordAngle.add(radius, ChordAngle.fromRadians(distanceRad)))

  def complement: Cap =
    if (isFull) Cap.empty
    else if (isEmpty) Cap.full
    else Cap(center * -1, ChordAngle.sub(ChordAngle.Straight, radius))

  def capBound: Cap = this

  def rectBound: SphereRect = {
    if (isEmpty) return SphereRect.empty
    val capAngle = radiusRadians
    val ctrLat = LatLng.latitude(center)
    var latLo = ctrLat - capAngle
    var latHi = ctrLat + capAngle
    var allLng = false
    if (latLo <= -math.Pi / 2) { latLo = -math.Pi / 2; allLng = true }
    if (latHi >= math.Pi / 2) { latHi = math.Pi / 2; allLng = true }
    if (allLng) SphereRect(R1Interval(latLo, latHi), S1Interval.full)
    else {
      // Longitude span via spherical law of sines (cap.go:236-260).
      val lngCtr = LatLng.longitude(center)
      val sinA = math.sin(capAngle)
      val sinC = math.cos(ctrLat)
      if (sinA > sinC) SphereRect(R1Interval(latLo, latHi), S1Interval.full)
      else {
        val angleA = math.asin(sinA / sinC)
        SphereRect(R1Interval(latLo, latHi),
          S1Interval.fromEndpoints(
            math.IEEEremainder(lngCtr - angleA, 2 * math.Pi),
            math.IEEEremainder(lngCtr + angleA, 2 * math.Pi)))
      }
    }
  }

  def containsCell(cell: Cell): Boolean = {
    val vertices = new Array[Vec3](4)
    var k = 0
    while (k < 4) {
      vertices(k) = cell.vertex(k)
      if (!containsPoint(vertices(k))) return false
      k += 1
    }
    !complement.intersectsVertices(cell, vertices)
  }

  def intersectsCell(cell: Cell): Boolean = {
    val vertices = new Array[Vec3](4)
    var k = 0
    while (k < 4) {
      vertices(k) = cell.vertex(k)
      if (containsPoint(vertices(k))) return true
      k += 1
    }
    intersectsVertices(cell, vertices)
  }

  /** Cap x cell-interior intersection given no vertex is inside
    * (cap.go:368-417).
    */
  private def intersectsVertices(cell: Cell, vertices: Array[Vec3]): Boolean = {
    if (radius >= ChordAngle.Right) return false
    if (isEmpty) return false
    if (cell.containsPoint(center)) return true
    val sin2Angle = ChordAngle.sin2(radius)
    var k = 0
    while (k < 4) {
      val edge = cell.edgeRaw(k)
      val dot = center.dot(edge)
      if (dot <= 0) {
        if (dot * dot > sin2Angle * edge.norm2) return false
        val dir = edge.cross(center)
        if (dir.dot(vertices(k)) < 0 && dir.dot(vertices((k + 1) & 3)) > 0)
          return true
      }
      k += 1
    }
    false
  }

  /** <= 4 vertex-neighbor cells, or the 6 faces for huge caps
    * (cap.go:420-445).
    */
  def cellUnionBound: Array[Long] = {
    val level = Metric.MinWidth.maxLevel(radiusRadians) - 1
    if (level < 0) Array.tabulate(6)(f => CellId.fromFace(f))
    else CellId.vertexNeighbors(CellId.fromPoint(center.x, center.y, center.z), level)
  }
}

object Cap {
  def fromPoint(p: Vec3): Cap = Cap(p, 0)
  def fromCenterRadians(center: Vec3, rad: Double): Cap =
    Cap(center, ChordAngle.fromRadians(rad))
  def fromCenterHeight(center: Vec3, h: Double): Cap =
    Cap(center, ChordAngle.fromSquaredLength(2 * h))
  val empty: Cap = Cap(Vec3(1, 0, 0), ChordAngle.Negative)
  val full: Cap = Cap(Vec3(1, 0, 0), ChordAngle.Straight)
}
