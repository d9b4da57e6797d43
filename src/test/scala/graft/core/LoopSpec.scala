package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Loop containment truth tables ported from the reference suite
  * (/root/reference/s2/loop_test.go:27-75,395-487).
  */
class LoopSpec extends AnyFunSuite {

  private val northHemi = Loop.parse("0:-180, 0:-90, 0:0, 0:90")
  private val southHemi = Loop.parse("0:90, 0:0, 0:-90, 0:-180")
  private val westHemi = Loop.parse("0:-180, -90:0, 0:0, 90:0")
  private val eastHemi = Loop.parse("90:0, 0:0, -90:0, 0:-180")
  private val candyCane = Loop.parse("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
  private val smallNECW = Loop.parse("35:20, 45:20, 40:25")
  private val arctic80 = Loop.parse("80:-150, 80:-30, 80:90")
  private val antarctic80 = Loop.parse("-80:120, -80:0, -80:-120")

  private val north = Vec3(0, 0, 1)
  private val south = Vec3(0, 0, -1)
  private val east = Vec3(0, 1, 0)
  private val west = Vec3(0, -1, 0)

  test("empty and full loops") {
    assert(!Loop.empty.containsPoint(north))
    assert(Loop.full.containsPoint(south))
    assert(Loop.empty.isEmpty)
    assert(Loop.full.isFull)
  }

  test("hemisphere + candy cane truth table under 4 rotations (loop_test.go:395)") {
    val cases = Seq(
      ("north", northHemi, north, south),
      ("south", southHemi, south, north),
      ("west", westHemi, west, east),
      ("east", eastHemi, east, west),
      ("candyCane", candyCane,
        LatLng.toPointDegrees(5, 71), LatLng.toPointDegrees(-8, 71)))
    for ((name, l0, in, out) <- cases) {
      var l = l0
      for (i <- 0 until 4) {
        assert(l.containsPoint(in), s"$name rotation $i should contain")
        assert(!l.containsPoint(out), s"$name rotation $i shouldn't contain")
        l = Loop.fromPoints(l.vertices.drop(1) ++ l.vertices.take(1))
      }
    }
  }

  test("cw loop and polar loops") {
    // smallNECW is clockwise: it contains almost the whole sphere.
    assert(smallNECW.containsPoint(north))
    assert(smallNECW.containsPoint(south))
    assert(!smallNECW.containsPoint(LatLng.toPointDegrees(40, 22)))
    assert(arctic80.containsPoint(north))
    assert(!arctic80.containsPoint(south))
    assert(antarctic80.containsPoint(south))
    assert(!antarctic80.containsPoint(north))
  }

  test("every cell vertex contained by exactly one adjacent cell loop (loop_test.go:458)") {
    for (level <- 0 until 3) {
      val points = scala.collection.mutable.Set[Vec3]()
      val loops = scala.collection.mutable.ArrayBuffer[Loop]()
      var id = CellId.childBeginAtLevel(CellId.fromFace(0), level)
      val end = CellId.childEndAtLevel(CellId.fromFace(5), level)
      while (id != end) {
        val cell = Cell.fromId(id)
        points += cell.center
        val verts = Array.tabulate(4)(cell.vertex)
        verts.foreach(points += _)
        loops += Loop.fromPoints(verts)
        id = CellId.next(id)
      }
      for (p <- points) {
        val count = loops.count(_.containsPoint(p))
        assert(count === 1, s"level $level point $p contained by $count loops")
      }
    }
  }

  test("loop bound sanity") {
    assert(arctic80.bound.lat.hi === math.Pi / 2)
    assert(arctic80.bound.lng.isFull)
    assert(antarctic80.bound.lat.lo === -math.Pi / 2)
    // candy cane wraps the equator fully in longitude
    assert(candyCane.bound.lng.isFull)
    assert(candyCane.bound.lat.contains(0))
  }

  test("loop area: hemispheres are 2*Pi") {
    assert(math.abs(northHemi.area - 2 * math.Pi) < 1e-9)
    assert(math.abs(southHemi.area - 2 * math.Pi) < 1e-9)
    // CW small loop covers nearly the full sphere
    assert(smallNECW.area > 4 * math.Pi - 0.01)
    // regular 10km 64-gon approximately pi*r^2
    val r = Earth.angleFromMeters(10000)
    val reg = Loop.regularLoop(LatLng.toPointDegrees(40, -70), r, 64)
    val expected = 2 * math.Pi * (1 - math.cos(r)) // spherical cap area
    assert(math.abs(reg.area - expected) / expected < 0.01)
  }

  test("regular loop vertices are at the given radius and contained") {
    val center = LatLng.toPointDegrees(48.8, 2.35)
    val r = Earth.angleFromMeters(50000)
    val loop = Loop.regularLoop(center, r, 32)
    for (v <- loop.vertices) {
      assert(math.abs(v.angle(center) - r) < 1e-12)
    }
    assert(loop.containsPoint(center))
    assert(!loop.containsPoint(LatLng.toPointDegrees(49.8, 2.35)))
  }

  test("containsCell / intersectsCell consistency") {
    val paris = LatLng.toPointDegrees(48.8, 2.35)
    val loop = Loop.regularLoop(paris, Earth.angleFromMeters(100000), 64)
    val inner = Cell.fromId(CellId.parent(CellId.fromPoint(paris.x, paris.y, paris.z), 12))
    assert(loop.containsCell(inner))
    assert(loop.intersectsCell(inner))
    val far = LatLng.toPointDegrees(40, -3.7)
    val outside = Cell.fromId(CellId.parent(CellId.fromPoint(far.x, far.y, far.z), 10))
    assert(!loop.containsCell(outside))
    assert(!loop.intersectsCell(outside))
    // a big cell overlapping the boundary: intersects but not contains
    val big = Cell.fromId(CellId.parent(CellId.fromPoint(paris.x, paris.y, paris.z), 6))
    assert(!loop.containsCell(big))
    assert(loop.intersectsCell(big))
  }
}
