package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Edge distances, polylines, polygons, hulls, multi-way intersection,
  * snappers, and the wire codec.
  */
class GeomOpsSpec extends AnyFunSuite {

  private val paris = LatLng.toPointDegrees(48.8566, 2.3522)
  private val london = LatLng.toPointDegrees(51.5074, -0.1278)
  private val ny = LatLng.toPointDegrees(40.7128, -74.0060)

  test("edge distances: project + distance basics") {
    val a = LatLng.toPointDegrees(0, 0)
    val b = LatLng.toPointDegrees(0, 10)
    val x = LatLng.toPointDegrees(1, 5)
    // closest point on the equator segment is ~(0, 5)
    val p = EdgeDistances.project(x, a, b)
    assert(math.abs(LatLng.latitude(p)) < 1e-9)
    assert(math.abs(LatLng.longitude(p) * LatLng.RadToDeg - 5) < 0.01)
    val d = EdgeDistances.distanceFromSegment(x, a, b)
    assert(math.abs(d - 1 * LatLng.DegToRad) < 1e-6)
    // endpoint case
    val y = LatLng.toPointDegrees(0, -4)
    assert(EdgeDistances.project(y, a, b) === a)
    // interpolate round trip
    val mid = EdgeDistances.interpolate(0.5, a, b)
    assert(math.abs(LatLng.longitude(mid) * LatLng.RadToDeg - 5) < 1e-9)
    assert(math.abs(EdgeDistances.distanceFraction(mid, a, b) - 0.5) < 1e-9)
  }

  test("polyline: length, interpolate, project, subsample") {
    val line = Polyline.parse("0:0, 0:10, 10:10")
    assert(math.abs(line.length - 20 * LatLng.DegToRad) < 1e-3)
    val (p, _) = line.interpolate(0.25)
    assert(math.abs(LatLng.longitude(p) * LatLng.RadToDeg - 5) < 0.01)
    val (proj, next) = line.project(LatLng.toPointDegrees(1, 3))
    assert(next === 1)
    assert(math.abs(LatLng.latitude(proj)) < 1e-9)
    // uninterpolate inverts interpolate
    val (q, nv) = line.interpolate(0.6)
    assert(math.abs(line.uninterpolate(q, nv) - 0.6) < 1e-6)
    // subsample: collinear middle vertex dropped at loose tolerance
    val line2 = Polyline.parse("0:0, 0:5, 0:10")
    val kept = line2.subsampleVertices(0.01)
    assert(kept.toSeq === Seq(0, 2))
    // right-side test
    assert(line.isOnRight(LatLng.toPointDegrees(-1, 5)))
    assert(!line.isOnRight(LatLng.toPointDegrees(1, 5)))
  }

  test("polygon with hole: parity containment") {
    // shell: big quad around (0,0); hole: smaller quad inside
    val shell = Loop.parse("-10:-10, -10:10, 10:10, 10:-10")
    val hole = Loop.parse("-3:-3, -3:3, 3:3, 3:-3")
    val poly = Polygon.fromLoops(Seq(shell, hole))
    assert(poly.containsPoint(LatLng.toPointDegrees(5, 5))) // in shell, not hole
    assert(!poly.containsPoint(LatLng.toPointDegrees(0, 0))) // inside hole
    assert(!poly.containsPoint(LatLng.toPointDegrees(20, 0))) // outside
    // area = shell - hole
    val expected = shell.area - hole.area
    assert(math.abs(poly.area - expected) < 1e-9)
  }

  test("convex hull contains all points") {
    val rng = new scala.util.Random(42)
    val pts = Seq.fill(100)(
      LatLng.toPointDegrees(40 + rng.nextDouble() * 5, -74 + rng.nextDouble() * 5))
    val hull = ConvexHull.hullLoop(pts)
    assert(hull.numVertices >= 3)
    for (p <- pts) {
      // hull must contain every input point (boundary counts: use a tiny
      // inward nudge via the centroid for strict tests)
      val c = hull.centroidTimesArea.normalize
      val nudged = ((p * 0.999999) + (c * 0.000001)).normalize
      assert(hull.containsPoint(nudged))
    }
    // hull of the hull's vertices is the same hull
    val again = ConvexHull.hull(hull.vertices.toSeq)
    assert(again.length === hull.numVertices)
  }

  test("convex hull excludes interior points on wide spreads") {
    // ADVICE r1 counterexample: under a raw lexicographic sort the chain
    // invariant broke for 60-90 degree spreads and this interior point
    // survived into the hull.
    val a = Vec3(0.6, 0, 0.8).normalize
    val b = Vec3(-0.3, 0.5, 0.81).normalize
    val c = Vec3(-0.3, -0.5, 0.81).normalize
    val inner = Vec3(-0.34, 0, 0.94).normalize
    val hull = ConvexHull.hullLoop(Seq(a, b, c, inner))
    assert(hull.numVertices === 3, s"interior point must not survive: " +
      hull.vertices.mkString(","))
    assert(hull.vertices.toSet === Set(a, b, c))
    // CCW-convex: every consecutive turn is counterclockwise
    for (i <- 0 until hull.numVertices) {
      assert(Predicates.robustSign(hull.vertex(i), hull.vertex(i + 1),
        hull.vertex(i + 2)) === Predicates.CounterClockwise)
    }
    assert(hull.containsPoint(inner))
  }

  test("convex hull on a wide random spread is convex and covering") {
    val rng = new scala.util.Random(7)
    val pts = Seq.fill(200)(
      LatLng.toPointDegrees(-20 + rng.nextDouble() * 70, -120 + rng.nextDouble() * 80))
    val hull = ConvexHull.hullLoop(pts)
    for (i <- 0 until hull.numVertices) {
      assert(Predicates.robustSign(hull.vertex(i), hull.vertex(i + 1),
        hull.vertex(i + 2)) === Predicates.CounterClockwise)
    }
    val c = hull.centroidTimesArea.normalize
    for (p <- pts) {
      val nudged = ((p * 0.999999) + (c * 0.000001)).normalize
      assert(hull.containsPoint(nudged))
    }
  }

  test("s2intersect finds pairwise overlaps") {
    val cover = RegionCoverer(maxCells = 8)
    val capA = Cap.fromCenterRadians(paris, Earth.angleFromMeters(300000))
    val capB = Cap.fromCenterRadians(london, Earth.angleFromMeters(300000))
    val capC = Cap.fromCenterRadians(ny, Earth.angleFromMeters(300000))
    val unions = Seq(cover.covering(capA), cover.covering(capB), cover.covering(capC))
    val found = S2Intersect.find(unions)
    // paris and london caps graze (344 km apart, 300+300 radius overlap);
    // ny overlaps nobody
    assert(found.exists(i => i.regions == Set(0, 1)))
    assert(!found.exists(i => i.regions.contains(2)))
    // every reported covering really intersects both inputs
    for (i <- found; r <- i.regions) {
      assert(unions(r).intersectsUnion(i.covering))
    }
  }

  test("snappers: determinism and radius bounds") {
    val s = CellIdSnapper(12)
    val p = LatLng.toPointDegrees(48.85661, 2.35221)
    val snapped = s.snap(p)
    assert(snapped === s.snap(p))
    assert(p.angle(snapped) <= s.snapRadius)
    // nearby points snap to the same cell center
    val q = LatLng.toPointDegrees(48.85662, 2.35222)
    assert(s.snapToCell(p) === s.snapToCell(q))

    val e6 = IntLatLngSnapper(6)
    val (la, ln) = e6.snapLatLng(48.8566123456, 2.3522123456)
    assert(la === 48.856612)
    assert(ln === 2.352212)
    assert(CellIdSnapper.forMaxSnapRadius(Earth.angleFromMeters(100)).snapRadius
      <= Earth.angleFromMeters(100))
  }

  test("codec round trips") {
    val id = CellId.fromLatLngDegrees(48.85, 2.35)
    assert(Codec.decodeCellId(Codec.encodeCellId(id)) === id)

    val cu = RegionCoverer(maxCells = 16).covering(
      Cap.fromCenterRadians(paris, Earth.angleFromMeters(50000)))
    assert(Codec.decodeCellUnion(Codec.encodeCellUnion(cu)) === cu)

    val loop = Loop.regularLoop(paris, Earth.angleFromMeters(10000), 16)
    val loop2 = Codec.decodeLoop(Codec.encodeLoop(loop))
    assert(loop2.vertices.toSeq === loop.vertices.toSeq)
    assert(loop2.originInside === loop.originInside)

    val poly = Polygon.fromLoops(Seq(
      Loop.parse("-10:-10, -10:10, 10:10, 10:-10"),
      Loop.parse("-3:-3, -3:3, 3:3, 3:-3")))
    val poly2 = Codec.decodePolygon(Codec.encodePolygon(poly))
    assert(poly2.numLoops === 2)
    assert(poly2.containsPoint(LatLng.toPointDegrees(5, 5)))
    assert(!poly2.containsPoint(LatLng.toPointDegrees(0, 0)))
  }
}
