package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Cell protocols from cell_test.go not covered by CellDistanceSpec:
  * closed-cell containment consistency with cellIDFromPoint near edges
  * (including the published s2geometry #463 example and the ambiguous
  * lat/lng point), the pole-facing rect-bound minimum-latitude cases,
  * cap bounds, and the contains/intersects cell relations.
  */
class CellProtocolSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(463463)

  private def randomCellId(): Long = {
    val p = Vec3(rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian()).normalize
    CellId.parent(CellId.fromPoint(p.x, p.y, p.z), rng.nextInt(CellId.MaxLevel + 1))
  }

  test("cell containment consistent with cellIDFromPoint near edges") {
    for (_ <- 0 until 1000) {
      val cell = Cell.fromId(randomCellId())
      val i1 = rng.nextInt(4)
      val v1 = cell.vertex(i1)
      // a point within ~epsilon of the next vertex, interpolated toward v1
      val v2base = cell.vertex((i1 + 1) & 3)
      val jitter = Vec3(rng.nextGaussian(), rng.nextGaussian(),
        rng.nextGaussian()) * 1e-14
      val v2 = (v2base + jitter).normalize
      val p = EdgeDistances.interpolate(rng.nextDouble(), v1, v2)
      val home = Cell.fromId(CellId.fromPoint(p.x, p.y, p.z))
      assert(home.containsPoint(p),
        s"point near cell edge not contained by its own leaf cell: $p")
    }
  }

  test("published consistency example (s2geometry issue 463)") {
    val p = Vec3(0.38203141040035632, 0.030196609707941954,
      0.9236558700239289).normalize
    val cell = Cell.fromId(CellId.fromPoint(p.x, p.y, p.z))
    assert(cell.containsPoint(p))
  }

  test("ambiguous point on a face boundary stays contained") {
    // x should be 0 but lat/lng->xyz gives x ~ 6.1e-17; st rounding then
    // assigns an arbitrary neighboring cell — ContainsPoint must expand
    // the bound enough to still contain p.
    val p = LatLng.toPointDegrees(-2, 90)
    val cell = Cell.fromId(CellId.parent(CellId.fromPoint(p.x, p.y, p.z), 1))
    assert(cell.containsPoint(p))
  }

  test("face-cell rect bounds around the poles (MinLat cases)") {
    def faceCell(f: Int) = Cell.fromId(CellId.fromFace(f))
    def containsDeg(c: Cell, lat: Double, lng: Double) =
      c.rectBound.containsLatLng(math.toRadians(lat), math.toRadians(lng))
    assert(!containsDeg(faceCell(2), 3, 0))
    assert(containsDeg(faceCell(2), 50, 0))
    assert(!containsDeg(faceCell(5), -3, 0))
    assert(containsDeg(faceCell(5), -50, 0))
  }

  test("cap bound contains the cell's vertices (deep cell)") {
    val c = Cell.fromId(CellId.childBeginAtLevel(CellId.fromFace(0), 20))
    val cap = c.capBound
    for (i <- 0 until 4) assert(cap.containsPoint(c.vertex(i)), s"vertex $i")
  }

  test("cell contains/intersects cell relations") {
    val c2 = CellId.childBeginAtLevel(CellId.fromFace(0), 2)
    val c5 = CellId.childBeginAtLevel(c2, 5)
    def region(id: Long) = CellRegion(Cell.fromId(id))
    assert(region(c2).intersectsCell(Cell.fromId(c2)))
    assert(region(c2).intersectsCell(Cell.fromId(c5)))
    assert(!region(c2).intersectsCell(Cell.fromId(CellId.next(c2))))
    assert(region(c2).containsCell(Cell.fromId(c2)))
    assert(region(c2).containsCell(Cell.fromId(c5)))
    assert(!region(c5).containsCell(Cell.fromId(c2)))
    assert(!region(c2).containsCell(Cell.fromId(CellId.next(c2))))
  }
}
