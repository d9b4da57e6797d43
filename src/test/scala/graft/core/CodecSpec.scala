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

  test("Polyline wire golden + round trip (encode_test.go:111)") {
    assert(hex(Codec.encodePolylinePoints(Array.empty[Vec3])) === "0100000000")
    assert(Codec.decodePolylinePoints(
      Codec.encodePolylinePoints(Array.empty[Vec3])).isEmpty)
    val pl = Polyline.fromLatLngsDegrees(Seq((0.0, 0.0), (0.0, 10.0), (10.0, 20.0)))
    val rt = Codec.decodePolyline(Codec.encodePolyline(pl))
    assert(rt.vertices.toSeq === pl.vertices.toSeq)
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
