package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Additional golden parity vectors ported verbatim from the reference
  * suites (/root/reference/s2/cellid_test.go:148-260, metric_test.go).
  */
class GoldenParitySpec extends AnyFunSuite {

  test("cellid <-> latlng golden pairs (cellid_test.go:171-205)") {
    val cases = Seq(
      (0x47a1cbd595522b39L, 49.703498679, 11.770681595),
      (0x46525318b63be0f9L, 55.685376759, 12.588490937),
      (0x52b30b71698e729dL, 45.486546517, -93.449700022),
      (0x46ed8886cfadda85L, 58.299984854, 23.049300056),
      (0x3663f18a24cbe857L, 34.364439040, 108.330699969),
      (0x010a06c0a948cf5dL, -30.694551352, -30.048758753),
      (0x2b2bfd076787c5dfL, -25.285264027, 133.823116966),
      (0xb09dff882a7809e1L, -75.000000031, 0.000000133),
      (0x94daa3d000000001L, -24.694439215, -47.537363213),
      (0x87a1000000000001L, 38.899730392, -99.901813021),
      (0x4fc76d5000000001L, 81.647200334, -55.631712940),
      (0x3b00955555555555L, 10.050986518, 78.293170610),
      (0x1dcc469991555555L, -34.055420593, 18.551140038),
      (0xb112966aaaaaaaabL, -69.219262171, 49.670072392))
    for ((id, lat, lng) <- cases) {
      // decoded center within 1e-9 degrees (~0.1 mm)
      val dist = LatLng.distance(
        lat * LatLng.DegToRad, lng * LatLng.DegToRad,
        CellId.toLatRadians(id), CellId.toLngRadians(id))
      assert(dist <= 1e-9 * LatLng.DegToRad,
        s"${CellId.toToken(id)}: center off by ${dist * LatLng.RadToDeg} deg")
      // re-encoding the rounded lat/lng yields the same leaf
      assert(CellId.fromLatLngDegrees(lat, lng) === id, CellId.toToken(id))
    }
  }

  test("debug-string parse edge cases (cellid_test.go:148-162)") {
    assert(CellId.fromDebugString("3/") === CellId.fromFace(3))
    assert(CellId.fromDebugString("0/21") ===
      CellId.children(CellId.children(CellId.fromFace(0))(2))(1))
    assert(CellId.fromDebugString("4/" + "0" * 30) ===
      CellId.rangeMin(CellId.fromFace(4)))
    assert(CellId.fromDebugString("4/" + "0" * 31) === 0L)
    assert(CellId.fromDebugString("") === 0L)
    assert(CellId.fromDebugString("7/") === 0L)
    assert(CellId.fromDebugString(" /") === 0L)
    assert(CellId.fromDebugString("3:0") === 0L)
    assert(CellId.fromDebugString("3/ 12") === 0L)
    assert(CellId.fromDebugString("3/1241") === 0L)
  }

  test("edge neighbors of face 1 corner at all levels (cellid_test.go:206-236)") {
    // face-level neighbors of face 1: down/right/up/left = 5,3,2,0
    val faceNbrs = CellId.edgeNeighbors(CellId.parent(CellId.fromFaceIJ(1, 0, 0), 0))
    assert(faceNbrs.map(CellId.face).toSeq === Seq(5, 3, 2, 0))
    faceNbrs.foreach(n => assert(CellId.isFace(n)))

    val maxIJ = CellId.MaxSize - 1
    for (level <- 1 to CellId.MaxLevel) {
      val id = CellId.parent(CellId.fromFaceIJ(1, 0, 0), level)
      val size = CellId.sizeIJ(level)
      val want = Seq(
        CellId.parent(CellId.fromFaceIJ(5, maxIJ, maxIJ), level),
        CellId.parent(CellId.fromFaceIJ(1, size, 0), level),
        CellId.parent(CellId.fromFaceIJ(1, 0, size), level),
        CellId.parent(CellId.fromFaceIJ(0, maxIJ, 0), level))
      assert(CellId.edgeNeighbors(id).toSeq === want, s"level $level")
    }
  }

  test("vertex neighbors of face-2 center (cellid_test.go:240-270)") {
    val id = CellId.fromPoint(0, 0, 1)
    val neighbors = CellId.vertexNeighbors(id, 5).sorted(
      Ordering.fromLessThan[Long]((a, b) => java.lang.Long.compareUnsigned(a, b) < 0))
    // the four level-5 cells sharing the face-2 center vertex
    val half = 1 << 29
    val want = (for (n <- 0 until 4) yield {
      val i = if (n < 2) half - 1 else half
      val j = if (n == 0 || n == 3) half - 1 else half
      CellId.parent(CellId.fromFaceIJ(2, i, j), 5)
    }).sorted(Ordering.fromLessThan[Long](
      (a, b) => java.lang.Long.compareUnsigned(a, b) < 0))
    assert(neighbors.toSeq === want.toSeq)
  }

  test("metric min/max level inversions (metric_test.go semantics)") {
    for (m <- Seq(Metric.MinWidth, Metric.MaxWidth, Metric.AvgDiag, Metric.MaxArea)) {
      for (level <- 0 to 30) {
        val v = m.value(level)
        // minLevel(value(level)) <= level and value(minLevel(v)) <= v
        val minL = m.minLevel(v)
        assert(m.value(minL) <= v * (1 + 1e-15))
        val maxL = m.maxLevel(v)
        assert(m.value(maxL) >= v * (1 - 1e-15))
      }
    }
    // explicit anchors
    assert(Metric.MinWidth.maxLevel(0.1) ===
      Metric.MinWidth.maxLevel(Metric.MinWidth.value(Metric.MinWidth.maxLevel(0.1))))
  }

  test("advance and advanceWrap traverse the curve consistently") {
    val id = CellId.childBeginAtLevel(CellId.fromFace(0), 10)
    assert(CellId.advance(id, 0) === id)
    val fwd = CellId.advance(id, 100)
    assert(CellId.advance(fwd, -100) === id)
    assert(CellId.distanceFromBegin(fwd) - CellId.distanceFromBegin(id) === 100)
    // wrap: stepping the full number of level-5 cells returns to start
    val c5 = CellId.childBeginAtLevel(CellId.fromFace(3), 5)
    val total = 6L * (1L << (2 * 5))
    assert(CellId.advanceWrap(c5, total) === c5)
    assert(CellId.advanceWrap(c5, -total) === c5)
    assert(CellId.nextWrap(CellId.advanceWrap(c5, total - 1)) === c5)
  }

  test("cell union normalization golden case (cellunion_test.go:76-103)") {
    val cu = CellUnion.normalized(Array(
      0x80855c0000000000L, // A: a cell over Pittsburg CA
      0x80855d0000000000L, // B, a child of A
      0x8085634000000000L, // first child of X, disjoint from A
      0x808563c000000000L, // second child of X
      0x80855dc000000000L, // a child of B
      0x808562c000000000L, // third child of X
      0x8085624000000000L, // fourth child of X
      0x80855d0000000000L  // B again
    ))
    assert(cu.ids.toSeq === Seq(
      0x80855c0000000000L, // A
      0x8085630000000000L  // X (four children collapsed)
    ))
    // empty normalizes to empty; a face cell to itself
    assert(CellUnion.normalized(Array.empty).isEmpty)
    assert(CellUnion.normalized(Array(CellId.fromFace(1))).ids.toSeq ===
      Seq(CellId.fromFace(1)))
  }

  test("cell union containment trichotomy around NYC (cellunion_test.go:143+)") {
    val nyc = 0x89c25c0000000000L
    val cu = CellUnion.normalized(Array(nyc))
    // contained
    assert(cu.containsCellId(CellId.childBegin(nyc)))
    assert(cu.containsCellId(CellId.childBeginAtLevel(nyc, 28)))
    // overlaps but not contained
    for (c <- Seq(CellId.immediateParent(nyc), CellId.fromFace(CellId.face(nyc)))) {
      assert(cu.intersectsCellId(c) && !cu.containsCellId(c))
    }
    // disjoint
    val disjoint = CellId.fromFaceIJ(CellId.face(nyc), 0, 0)
    if (!CellId.contains(nyc, disjoint) && !CellId.contains(disjoint, nyc)) {
      assert(!cu.intersectsCellId(CellId.parent(disjoint, 10)) ||
        CellId.intersects(nyc, CellId.parent(disjoint, 10)))
    }
  }
}
