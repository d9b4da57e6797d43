package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Wire-format goldens ported verbatim from the reference
  * (/root/reference/s2/encode_test.go:39-138 TestEncodeDecode): encoded
  * bytes must equal the C++/Java-interoperable hex exactly, and decode
  * must round-trip.
  */
class CodecSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString

  private def checkCellId(golden: String, id: Long): Unit = {
    assert(hex(Codec.encodeCellId(id)) === golden)
    assert(Codec.decodeCellId(Codec.encodeCellId(id)) === id)
  }

  test("Cap wire goldens (encode_test.go:39-48)") {
    val cases = Seq(
      "000000000000F03F00000000000000000000000000000000000000000000F0BF" -> Cap.empty,
      "000000000000F03F000000000000000000000000000000000000000000001040" -> Cap.full,
      "3F36105836A8E93F2A2460E5CE1AE13F2A2460E5CE1AD13F0000000000000000" ->
        Cap.fromPoint(Vec3(3, 2, 1).normalize),
      "00000000000000000000000000000000000000000000F03F0000000000001040" ->
        Cap.fromCenterHeight(Vec3(0, 0, 1), 5),
      "00000000000000000000000000000000000000000000F03F000000000000F03F" ->
        Cap.fromCenterHeight(Vec3(0, 0, 1), 0.5))
    for ((golden, cap) <- cases) {
      assert(hex(Codec.encodeCap(cap)) === golden)
      assert(Codec.decodeCap(Codec.encodeCap(cap)) === cap)
    }
  }

  test("CellID wire goldens (encode_test.go:50-60)") {
    checkCellId("0000000000000010", CellId.fromFace(0))
    checkCellId("00000000000000B0", CellId.fromFace(5))
    checkCellId("0100000000000020", CellId.childEndAtLevel(CellId.fromFace(0), CellId.MaxLevel))
    checkCellId("01000000000000C0", CellId.childEndAtLevel(CellId.fromFace(5), CellId.MaxLevel))
    checkCellId("0057341200000060", CellId.fromFacePosLevel(3, 0x12345678L, CellId.MaxLevel - 4))
    checkCellId("0000000000000000", 0L)
  }

  test("CellUnion wire goldens (encode_test.go:72-76)") {
    val cases = Seq(
      "010000000000000000" -> Array.empty[Long],
      "0101000000000000000000000000000030" -> Array(CellId.fromFace(1)),
      "0103000000000000003300000000000000AB8F74E3080000002734F8DEBC0A2391" ->
        Array(0x33L, 0x8e3748fabL, 0x91230abcdef83427L))
    for ((golden, ids) <- cases) {
      val cu = CellUnion.fromNormalized(ids)
      assert(hex(Codec.encodeCellUnion(cu)) === golden)
      assert(Codec.decodeCellUnion(Codec.encodeCellUnion(cu)).ids.toSeq === ids.toSeq)
    }
  }

  private val cross1 = "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1"
  private val crossCenterHole = "-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5"

  test("Loop wire goldens (encode_test.go:79-82)") {
    val goldenEmpty = "010100000000000000000000000000000000000000000000000000F03F000000000001000000000000F03F0000000000000000182D4454FB210940182D4454FB2109C0"
    val goldenFull = "010100000000000000000000000000000000000000000000000000F0BF010000000001182D4454FB21F9BF182D4454FB21F93F182D4454FB2109C0182D4454FB210940"
    val goldenCross = "0108000000D44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958DEA1BFB4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF91BFB4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF913FD44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958DEA13FD44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA13FB4825F3C81FDEF3F27DCF7C958DE91BF1EDD892B0BDF913FB4825F3C81FDEF3F27DCF7C958DE91BF1EDD892B0BDF91BFD44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA1BF0000000000013EFC10E8F8DFA1BF3EFC10E8F8DFA13F389D52A246DF91BF389D52A246DF913F"
    assert(hex(Codec.encodeLoop(Loop.empty)) === goldenEmpty)
    assert(hex(Codec.encodeLoop(Loop.full)) === goldenFull)
    assert(hex(Codec.encodeLoop(Loop.parse(cross1))) === goldenCross)
    val rt = Codec.decodeLoop(Codec.encodeLoop(Loop.parse(cross1)))
    assert(rt.vertices.toSeq === Loop.parse(cross1).vertices.toSeq)
  }

  test("Point wire goldens (encode_test.go:93-95)") {
    val goldenOrigin = "013BED86AA997A84BF88EC8B48C53C653FACD2721A90FFEF3F"
    val goldenTesting = "0109AD578332DBCA3FBC9FDB9BB4E4EE3FE67E7C2CA7CEC33F"
    assert(hex(Codec.encodePoint(EdgeCrossings.originPoint)) === goldenOrigin)
    val pt = Vec3(12.34, 56.78, 9.1011).normalize
    assert(hex(Codec.encodePoint(pt)) === goldenTesting)
    assert(Codec.decodePoint(Codec.encodePoint(pt)) === pt)
  }

  test("Polygon wire goldens (encode_test.go:104-107)") {
    val golden1 = "010100010000000108000000D44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958DEA1BFB4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF91BFB4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF913FD44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958DEA13FD44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA13FB4825F3C81FDEF3F27DCF7C958DE91BF1EDD892B0BDF913FB4825F3C81FDEF3F27DCF7C958DE91BF1EDD892B0BDF91BFD44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA1BF0000000000013EFC10E8F8DFA1BF3EFC10E8F8DFA13F389D52A246DF91BF389D52A246DF913F013EFC10E8F8DFA1BF3EFC10E8F8DFA13F389D52A246DF91BF389D52A246DF913F"
    val golden2 = "010101020000000108000000D44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958DEA1BFB4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF91BFB4825F3C81FDEF3F27DCF7C958DE913F1EDD892B0BDF913FD44A8442C3F9EF3F7EDA2AB341DC913F27DCF7C958DEA13FD44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA13FB4825F3C81FDEF3F27DCF7C958DE91BF1EDD892B0BDF913FB4825F3C81FDEF3F27DCF7C958DE91BF1EDD892B0BDF91BFD44A8442C3F9EF3F7EDA2AB341DC91BF27DCF7C958DEA1BF0000000000013EFC10E8F8DFA1BF3EFC10E8F8DFA13F389D52A246DF91BF389D52A246DF913F0104000000C5D7FA4B60FFEF3F1EDD892B0BDF813F214C95C437DF81BFC5D7FA4B60FFEF3F1EDD892B0BDF813F214C95C437DF813FC5D7FA4B60FFEF3F1EDD892B0BDF81BF214C95C437DF813FC5D7FA4B60FFEF3F1EDD892B0BDF81BF214C95C437DF81BF000100000001900C5E3B73DF81BF900C5E3B73DF813F399D52A246DF81BF399D52A246DF813F013EFC10E8F8DFA1BF3EFC10E8F8DFA13F389D52A246DF91BF389D52A246DF913F"
    val p1 = Polygon.fromLoopStrings(Seq(cross1))
    val p2 = Polygon.fromLoopStrings(Seq(cross1, crossCenterHole))
    assert(hex(Codec.encodePolygon(p1)) === golden1)
    assert(hex(Codec.encodePolygon(p2)) === golden2)
    val rt = Codec.decodePolygon(Codec.encodePolygon(p2))
    assert(rt.numLoops === 2)
    assert(rt.loops(1).depth === 1)
  }

  test("compressed loop golden: decode + re-encode (encode_test.go:262-293)") {
    val goldenHex = "041B02222082A222A806A0C7A991DE86D905D7C3A691F2DEE40383908880A0958805000003"
    val bytes = goldenHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val d = new PointCompression.Dec(bytes)
    val loop = Codec.decodeLoopCompressed(d, CellId.MaxLevel)
    val want = Seq((0.0, 178.0), (-1.0, 180.0), (0.0, -179.0), (1.0, -180.0))
    assert(loop.numVertices === 4)
    for ((v, (la, ln)) <- loop.vertices.zip(want)) {
      assert(math.abs(LatLng.latitude(v) * LatLng.RadToDeg - la) < 1e-7)
      assert(math.abs(math.IEEEremainder(
        LatLng.longitude(v) * LatLng.RadToDeg - ln, 360)) < 1e-7)
    }
    val e = new PointCompression.Enc
    Codec.encodeLoopCompressed(e, loop, CellId.MaxLevel,
      loop.vertices.map(PointCompression.xyzToFaceSiTi))
    assert(hex(e.toBytes) === goldenHex)
  }

  test("compressed polygon goldens: empty and full (encode_test.go:99-102)") {
    assert(hex(Codec.encodePolygon(Polygon.empty)) === "041E00")
    assert(hex(Codec.encodePolygon(Polygon.full)) === "040001010B000100")
    assert(Codec.decodePolygon(Codec.encodePolygon(Polygon.empty)).numLoops === 0)
    val full = Codec.decodePolygon(Codec.encodePolygon(Polygon.full))
    assert(full.numLoops === 1 && full.loops(0).isFull)
  }

  test("snapped polygons choose the compressed format and round trip") {
    // Loops whose vertices are exact level-12 cell centers: the encoder
    // must pick v4 and decode must reproduce the vertices exactly.
    def snappedLoop(latDeg: Double, lngDeg: Double, n: Int): Loop = {
      val base = CellId.parent(CellId.fromLatLngDegrees(latDeg, lngDeg), 12)
      var cells = List(base)
      var cur = base
      for (_ <- 1 until n) { cur = CellId.next(cur); cells ::= cur }
      // cell centers in a CCW-ish ring: just use distinct centers (any
      // simple chain works for codec purposes)
      Loop.fromPoints(cells.reverse.map(c => CellId.toPoint(c)).toArray)
    }
    val p = Polygon.fromLoops(Seq(snappedLoop(40.7, -74.0, 8)))
    val enc = Codec.encodePolygon(p)
    assert(enc(0) === 4.toByte, "snapped polygon must use the v4 format")
    val rt = Codec.decodePolygon(enc)
    assert(rt.loops(0).vertices.toSeq === p.loops(0).vertices.toSeq)

    // Unsnapped (random) vertices must stay lossless v1 and round trip.
    val q = Polygon.fromLoops(Seq(Loop.regularLoop(
      LatLng.toPointDegrees(40.7, -74.0), 0.01, 16)))
    val encQ = Codec.encodePolygon(q)
    assert(encQ(0) === 1.toByte, "unsnapped polygon must stay lossless")
    assert(Codec.decodePolygon(encQ).loops(0).vertices.toSeq ===
      q.loops(0).vertices.toSeq)
  }

  test("interleave and nth-derivative primitives round trip") {
    val rng = new scala.util.Random(99)
    for (_ <- 0 until 2000) {
      val x = rng.nextInt() & 0xFFFFFFFFL
      val y = rng.nextInt() & 0xFFFFFFFFL
      val (gx, gy) = PointCompression.deinterleaveUint32(
        PointCompression.interleaveUint32(x, y))
      assert(gx === x && gy === y)
    }
    for (_ <- 0 until 200) {
      val values = Array.fill(50)(rng.nextInt())
      val enc = new PointCompression.NthDerivativeCoder(2)
      val dec = new PointCompression.NthDerivativeCoder(2)
      val coded = values.map(enc.encode)
      assert(coded.map(dec.decode).toSeq === values.toSeq)
    }
    for (_ <- 0 until 2000) {
      val v = rng.nextInt()
      assert(PointCompression.zigzagDecode(PointCompression.zigzagEncode(v)) === v)
    }
  }

  test("random geometry re-encodes byte-identically after a round trip") {
    val rng = new scala.util.Random(31337)
    for (_ <- 0 until 120) {
      val c = LatLng.toPointDegrees(rng.nextDouble() * 160 - 80,
        rng.nextDouble() * 360 - 180)
      // loops: lossless round trip must be byte-stable
      val loop = Loop.regularLoop(c, 0.001 + rng.nextDouble() * 0.3,
        3 + rng.nextInt(40))
      val e1 = Codec.encodeLoop(loop)
      assert(Codec.encodeLoop(Codec.decodeLoop(e1)).toSeq === e1.toSeq)
      // polylines, both wire versions
      var lat = rng.nextDouble() * 100 - 50
      var lng = rng.nextDouble() * 300 - 150
      val pl = new Polyline(Array.fill(1 + rng.nextInt(12)) {
        lat += rng.nextDouble() - 0.5; lng += rng.nextDouble() - 0.5
        LatLng.toPointDegrees(lat, lng)
      })
      val p1 = Codec.encodePolyline(pl)
      assert(Codec.encodePolyline(Codec.decodePolyline(p1)).toSeq === p1.toSeq)
      // compressed polyline: snapped vertices survive exactly
      val level = 10 + rng.nextInt(15)
      val snapped = pl.vertices.map(v =>
        CellId.toPoint(CellId.parent(CellId.fromPoint(v.x, v.y, v.z), level)))
      val pc = Codec.encodePolylineCompressed(snapped, level)
      assert(Codec.decodePolylineAnyVersion(pc).toSeq === snapped.toSeq)
      // cell unions
      val cu = CellUnion.normalized(Array.fill(1 + rng.nextInt(8)) {
        val p = LatLng.toPointDegrees(rng.nextDouble() * 160 - 80,
          rng.nextDouble() * 360 - 180)
        CellId.parent(CellId.fromPoint(p.x, p.y, p.z), rng.nextInt(28))
      })
      val u1 = Codec.encodeCellUnion(cu)
      assert(Codec.encodeCellUnion(Codec.decodeCellUnion(u1)).toSeq === u1.toSeq)
    }
  }

  test("Polyline wire golden + round trip (encode_test.go:111)") {
    assert(hex(Codec.encodePolylinePoints(Array.empty[Vec3])) === "0100000000")
    assert(Codec.decodePolylinePoints(
      Codec.encodePolylinePoints(Array.empty[Vec3])).isEmpty)
    val pl = Polyline.fromLatLngsDegrees(Seq((0.0, 0.0), (0.0, 10.0), (10.0, 20.0)))
    val rt = Codec.decodePolyline(Codec.encodePolyline(pl))
    assert(rt.vertices.toSeq === pl.vertices.toSeq)
  }

  test("compressed polyline v2 round trips snapped and unsnapped chains") {
    // snapped: level-10 cell centers
    val snapped = (0 until 20).scanLeft(
      CellId.parent(CellId.fromLatLngDegrees(35.6, 139.6), 10))((c, _) =>
      CellId.next(c)).map(CellId.toPoint).toArray
    val enc = Codec.encodePolylineCompressed(snapped, 10)
    assert(enc(0) === 2.toByte)
    assert(Codec.decodePolylineAnyVersion(enc).toSeq === snapped.toSeq)
    // unsnapped points ride as exact exceptions
    val raw = Array(
      LatLng.toPointDegrees(1.234, 5.678), LatLng.toPointDegrees(2.3, 6.7))
    val enc2 = Codec.encodePolylineCompressed(raw, 10)
    assert(Codec.decodePolylineAnyVersion(enc2).toSeq === raw.toSeq)
    // v1 passes through the same decoder
    assert(Codec.decodePolylineAnyVersion(
      Codec.encodePolylinePoints(raw)).toSeq === raw.toSeq)
  }

  test("Rect wire goldens (encode_test.go:134-138)") {
    val cases = Seq(
      "01000000000000F03F0000000000000000182D4454FB210940182D4454FB2109C0" ->
        SphereRect.empty,
      "01182D4454FB21F9BF182D4454FB21F93F182D4454FB2109C0182D4454FB210940" ->
        SphereRect.full,
      "0165732D3852C1F03F182D4454FB21F93FF75B8A41358C03408744E74A185706C0" ->
        SphereRect.fromLatLng(80 * LatLng.DegToRad, 170 * LatLng.DegToRad)
          .expanded(20 * LatLng.DegToRad, 30 * LatLng.DegToRad))
    for ((golden, r) <- cases) {
      assert(hex(Codec.encodeRect(r)) === golden)
      assert(Codec.decodeRect(Codec.encodeRect(r)) === r)
    }
  }
}
