package graft.core

/** Compressed point encoding for the wire format
  * (/root/reference/s2/pointcompression.go:15-329, interleave.go:15-143,
  * nthderivative.go:15-93): snapped vertices become (face, si, ti) cell
  * centers at a snap level; faces run-length encode; (pi, qi) sequences
  * are 2nd-derivative + zigzag coded, bit-interleaved, and varint
  * packed; off-level vertices ride as exact float64 exceptions.
  */
object PointCompression {

  final val DerivativeEncodingOrder = 2
  final val NumFaces = 6

  /** (x, y, z, face, si, ti, level) of a vertex; level == -1 when the
    * point is not a cell center (stuv.go:339-362 xyzToFaceSiTi).
    */
  final case class XyzFaceSiTi(xyz: Vec3, face: Int, si: Long, ti: Long, level: Int)

  def xyzToFaceSiTi(p: Vec3): XyzFaceSiTi = {
    val face = STUV.face(p.x, p.y, p.z)
    val u = STUV.validFaceXYZtoU(face, p.x, p.y, p.z)
    val v = STUV.validFaceXYZtoV(face, p.x, p.y, p.z)
    val si = STUV.stToSiTi(STUV.uvToST(u))
    val ti = STUV.stToSiTi(STUV.uvToST(v))
    val level = CellId.MaxLevel -
      java.lang.Long.numberOfTrailingZeros(si | STUV.MaxSiTi)
    if (level < 0 || level != CellId.MaxLevel -
        java.lang.Long.numberOfTrailingZeros(ti | STUV.MaxSiTi))
      return XyzFaceSiTi(p, face, si, ti, -1)
    // Exact center check: recompute the center the same way (stuv.go:353-362).
    if (p == faceSiTiToXYZ(face, si, ti).normalize)
      XyzFaceSiTi(p, face, si, ti, level)
    else XyzFaceSiTi(p, face, si, ti, -1)
  }

  def faceSiTiToXYZ(face: Int, si: Long, ti: Long): Vec3 =
    STUV.faceUVToXYZ(face, STUV.stToUV(STUV.siTiToST(si)),
      STUV.stToUV(STUV.siTiToST(ti)))

  // --- growable little-endian encoder / positional decoder -----------

  final class Enc {
    private val out = new java.io.ByteArrayOutputStream()
    def writeByte(b: Int): Unit = out.write(b & 0xff)
    def writeUvarint(x0: Long): Unit = {
      var x = x0
      while ((x & ~0x7fL) != 0) { writeByte(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      writeByte(x.toInt)
    }
    def writeFloat64(d: Double): Unit = {
      var bits = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { writeByte((bits & 0xff).toInt); bits >>>= 8; i += 1 }
    }
    def toBytes: Array[Byte] = out.toByteArray
  }

  final class Dec(bytes: Array[Byte], var pos: Int = 0) {
    def readByte(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def readUvarint(): Long = {
      var x = 0L
      var shift = 0
      var b = readByte()
      while ((b & 0x80) != 0) {
        x |= (b & 0x7fL) << shift
        shift += 7
        b = readByte()
      }
      x | (b.toLong << shift)
    }
    def readFloat64(): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (readByte().toLong << (8 * i)); i += 1 }
      java.lang.Double.longBitsToDouble(bits)
    }
  }

  // --- bit interleaving (interleave.go, tables generated, not copied) -

  private val interleaveLookup: Array[Long] = Array.tabulate(256) { i =>
    var out = 0L
    var b = 0
    while (b < 8) { if (((i >> b) & 1) != 0) out |= 1L << (2 * b); b += 1 }
    out
  }

  private val deinterleaveLookup: Array[Int] = Array.tabulate(256) { i =>
    // collapse even bits of i into 4 bits
    var out = 0
    var b = 0
    while (b < 4) { if (((i >> (2 * b)) & 1) != 0) out |= 1 << b; b += 1 }
    out
  }

  def interleaveUint32(x: Long, y: Long): Long =
    interleaveLookup((x & 0xff).toInt) |
      (interleaveLookup(((x >>> 8) & 0xff).toInt) << 16) |
      (interleaveLookup(((x >>> 16) & 0xff).toInt) << 32) |
      (interleaveLookup(((x >>> 24) & 0xff).toInt) << 48) |
      (interleaveLookup((y & 0xff).toInt) << 1) |
      (interleaveLookup(((y >>> 8) & 0xff).toInt) << 17) |
      (interleaveLookup(((y >>> 16) & 0xff).toInt) << 33) |
      (interleaveLookup(((y >>> 24) & 0xff).toInt) << 49)

  def deinterleaveUint32(code: Long): (Long, Long) = {
    // even bits -> x, odd bits -> y (lut indexed by masked byte)
    var x = 0L
    var y = 0L
    var i = 0
    while (i < 8) {
      val byte = ((code >>> (8 * i)) & 0xff).toInt
      x |= deinterleaveLookup(byte & 0x55).toLong << (4 * i)
      y |= deinterleaveLookup((byte & 0xaa) >> 1).toLong << (4 * i)
      i += 1
    }
    (x, y)
  }

  // --- nth derivative coder (nthderivative.go) -----------------------

  final class NthDerivativeCoder(n: Int) {
    require(n >= 0 && n <= 10)
    private val memory = new Array[Int](10)
    private var m = 0
    def encode(k0: Int): Int = {
      var k = k0
      var i = 0
      while (i < m) {
        val delta = k - memory(i)
        memory(i) = k
        k = delta
        i += 1
      }
      if (m < n) { memory(m) = k; m += 1 }
      k
    }
    def decode(k0: Int): Int = {
      var k = k0
      if (m < n) m += 1
      var i = m - 1
      while (i >= 0) {
        memory(i) += k
        k = memory(i)
        i -= 1
      }
      k
    }
  }

  def zigzagEncode(x: Int): Long = (((x << 1) ^ (x >> 31)).toLong) & 0xFFFFFFFFL
  def zigzagDecode(x: Long): Int = ((x >>> 1) ^ -(x & 1)).toInt

  // --- (pi, qi) space ------------------------------------------------

  /** si clamped and shifted into level bits (pointcompression.go:292-305). */
  def siTiToPiQi(siTi: Long, level: Int): Long = {
    val max = STUV.MaxSiTi - 1
    val s = if (siTi > max) max else siTi
    s >>> (CellId.MaxLevel + 1 - level)
  }

  def piQiToST(pi: Long, level: Int): Double =
    (pi.toDouble + 0.5) / (1L << level).toDouble

  def facePiQiToXYZ(face: Int, pi: Long, qi: Long, level: Int): Vec3 =
    STUV.faceUVToXYZ(face, STUV.stToUV(piQiToST(pi, level)),
      STUV.stToUV(piQiToST(qi, level))).normalize

  // --- the point stream (pointcompression.go:50-92, 218-260) ---------

  def encodePointsCompressed(e: Enc, vertices: Array[XyzFaceSiTi], level: Int): Unit = {
    // run-length encoded faces: varint of NumFaces*count + face
    var i = 0
    while (i < vertices.length) {
      val face = vertices(i).face
      var count = 0
      while (i < vertices.length && vertices(i).face == face) { count += 1; i += 1 }
      e.writeUvarint(NumFaces.toLong * count + face)
    }

    val piCoder = new NthDerivativeCoder(DerivativeEncodingOrder)
    val qiCoder = new NthDerivativeCoder(DerivativeEncodingOrder)
    i = 0
    while (i < vertices.length) {
      val pi = siTiToPiQi(vertices(i).si, level)
      val qi = siTiToPiQi(vertices(i).ti, level)
      if (i == 0) {
        // fixed-length first point, no zigzag (cannot be negative)
        val codedPi = piCoder.encode(pi.toInt)
        val codedQi = qiCoder.encode(qi.toInt)
        var interleaved = interleaveUint32(codedPi.toLong & 0xFFFFFFFFL,
          codedQi.toLong & 0xFFFFFFFFL)
        val bytesRequired = (level + 7) / 8 * 2
        var k = 0
        while (k < bytesRequired) {
          e.writeByte((interleaved & 0xff).toInt)
          interleaved >>>= 8
          k += 1
        }
      } else {
        val zzPi = zigzagEncode(piCoder.encode(pi.toInt))
        val zzQi = zigzagEncode(qiCoder.encode(qi.toInt))
        e.writeUvarint(interleaveUint32(zzPi, zzQi))
      }
      i += 1
    }

    val offCenter = vertices.indices.filter(k => vertices(k).level != level)
    e.writeUvarint(offCenter.length.toLong)
    offCenter.foreach { idx =>
      e.writeUvarint(idx.toLong)
      e.writeFloat64(vertices(idx).xyz.x)
      e.writeFloat64(vertices(idx).xyz.y)
      e.writeFloat64(vertices(idx).xyz.z)
    }
  }

  def decodePointsCompressed(d: Dec, level: Int, n: Int): Array[Vec3] = {
    // face runs
    val faceOf = new Array[Int](n)
    var parsed = 0
    while (parsed < n) {
      val faceAndCount = d.readUvarint()
      val face = (faceAndCount % NumFaces).toInt
      val count = (faceAndCount / NumFaces).toInt
      require(count > 0, "non-positive face run")
      var k = 0
      while (k < count && parsed < n) { faceOf(parsed) = face; parsed += 1; k += 1 }
    }

    val piCoder = new NthDerivativeCoder(DerivativeEncodingOrder)
    val qiCoder = new NthDerivativeCoder(DerivativeEncodingOrder)
    val out = new Array[Vec3](n)
    var i = 0
    while (i < n) {
      var pi = 0L
      var qi = 0L
      if (i == 0) {
        val bytesToRead = (level + 7) / 8 * 2
        var interleaved = 0L
        var k = 0
        while (k < bytesToRead) {
          interleaved |= d.readByte().toLong << (8 * k)
          k += 1
        }
        val (p0, q0) = deinterleaveUint32(interleaved)
        pi = piCoder.decode(p0.toInt).toLong & 0xFFFFFFFFL
        qi = qiCoder.decode(q0.toInt).toLong & 0xFFFFFFFFL
      } else {
        val (zp, zq) = deinterleaveUint32(d.readUvarint())
        pi = piCoder.decode(zigzagDecode(zp)).toLong & 0xFFFFFFFFL
        qi = qiCoder.decode(zigzagDecode(zq)).toLong & 0xFFFFFFFFL
      }
      out(i) = facePiQiToXYZ(faceOf(i), pi, qi, level)
      i += 1
    }

    val numOffCenter = d.readUvarint().toInt
    require(numOffCenter <= n, "bad off-center count")
    var k = 0
    while (k < numOffCenter) {
      val idx = d.readUvarint().toInt
      require(idx < n, "bad off-center index")
      out(idx) = Vec3(d.readFloat64(), d.readFloat64(), d.readFloat64())
      k += 1
    }
    out
  }
}
