package graft.core

/** Snap functions: round points to a discrete set with bounded snap radius
  * (/root/reference/s2/builder_snapper.go:15-505). Used for deduplicating
  * near-identical geocodes and for stable geometry keys.
  */
sealed trait Snapper extends Serializable {
  /** Max distance a point can move when snapped, radians. */
  def snapRadius: Double
  def snap(p: Vec3): Vec3
}

/** Identity snapper: no rounding (builder_snapper.go IdentitySnapper). */
final case class IdentitySnapper(snapRadius: Double = 0) extends Snapper {
  def snap(p: Vec3): Vec3 = p
}

/** Snap to S2 cell centers at a fixed level
  * (builder_snapper.go CellIDSnapper): radius bound = half the max diag.
  */
final case class CellIdSnapper(level: Int) extends Snapper {
  val snapRadius: Double = 0.5 * Metric.MaxDiag.value(level)
  def snap(p: Vec3): Vec3 =
    CellId.toPoint(CellId.parent(CellId.fromPoint(p.x, p.y, p.z), level))
  def snapToCell(p: Vec3): Long =
    CellId.parent(CellId.fromPoint(p.x, p.y, p.z), level)

  /** Level needed so the snap radius is at most r (builder_snapper.go
    * levelForMaxSnapRadius semantics).
    */
}

object CellIdSnapper {
  def forMaxSnapRadius(radiusRad: Double): CellIdSnapper =
    CellIdSnapper(math.min(CellId.MaxLevel,
      Metric.MaxDiag.minLevel(2 * radiusRad)))
}

/** Snap lat/lng to a fixed decimal exponent (E5/E6/E7 fixed point)
  * (builder_snapper.go IntLatLngSnapper).
  */
final case class IntLatLngSnapper(exponent: Int) extends Snapper {
  require(exponent >= 0 && exponent <= 10)
  private val scale = math.pow(10, exponent)
  // max movement: half a grid diagonal at the equator
  val snapRadius: Double = (math.sqrt(2.0) / 2) * (math.Pi / 180) / scale

  def snapLatLng(latDeg: Double, lngDeg: Double): (Double, Double) =
    (math.rint(latDeg * scale) / scale, math.rint(lngDeg * scale) / scale)

  def snap(p: Vec3): Vec3 = {
    val (la, ln) = snapLatLng(
      LatLng.latitude(p) * LatLng.RadToDeg, LatLng.longitude(p) * LatLng.RadToDeg)
    LatLng.toPointDegrees(la, ln)
  }
}

/** Lossless little-endian wire codec for geometry values stored in binary
  * columns (/root/reference/s2/encode.go:15-60 framing; simplified: same
  * version byte + LE doubles, no varint point compression).
  */
object Codec {
  private val Version: Byte = 1

  def encodeCellId(id: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(id)
    b.array()
  }

  def decodeCellId(bytes: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong

  def encodeCellUnion(cu: CellUnion): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(1 + 4 + 8 * cu.size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(Version)
    b.putInt(cu.size)
    cu.ids.foreach(b.putLong)
    b.array()
  }

  def decodeCellUnion(bytes: Array[Byte]): CellUnion = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.get() == Version, "bad version")
    val n = b.getInt
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = b.getLong; i += 1 }
    CellUnion.fromNormalized(ids)
  }

  /** Loop wire form: version | originInside | n | n*(x,y,z doubles).
    * Mirrors the reference's lossless loop encoding fields
    * (loop.go:1255-1324) without the compressed variant.
    */
  def encodeLoop(l: Loop): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(1 + 1 + 4 + 24 * l.numVertices)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(Version)
    b.put(if (l.originInside) 1.toByte else 0.toByte)
    b.putInt(l.numVertices)
    l.vertices.foreach { v => b.putDouble(v.x); b.putDouble(v.y); b.putDouble(v.z) }
    b.array()
  }

  def decodeLoop(bytes: Array[Byte]): Loop = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.get() == Version, "bad version")
    val originInside = b.get() == 1
    val n = b.getInt
    val verts = Array.fill(n)(Vec3(b.getDouble, b.getDouble, b.getDouble))
    val loop = Loop.fromPoints(verts)
    // originInside is derivable from vertices; assert round-trip integrity
    require(loop.originInside == originInside, "origin parity mismatch on decode")
    loop
  }

  def encodePolygon(p: Polygon): Array[Byte] = {
    val loops = p.loops.map(encodeLoop)
    val total = 1 + 4 + loops.map(l => 4 + l.length).sum
    val b = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(Version)
    b.putInt(loops.length)
    loops.foreach { l => b.putInt(l.length); b.put(l) }
    b.array()
  }

  def decodePolygon(bytes: Array[Byte]): Polygon = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.get() == Version, "bad version")
    val n = b.getInt
    val loops = Array.fill(n) {
      val len = b.getInt
      val arr = new Array[Byte](len)
      b.get(arr)
      decodeLoop(arr)
    }
    new Polygon(loops)
  }
}
