package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** ShapeIndexTarget protocols (min/max_distance_targets_test.go index
  * cases): strict update-when-equal, containing-shapes over
  * multi-component targets, the empty/full polygon special cases, and
  * brute-force consistency of index-to-index min/max distances.
  */
class ShapeIndexTargetSpec extends AnyFunSuite {

  private def pt(lat: Double, lng: Double) = LatLng.toPointDegrees(lat, lng)

  // the reference's 5-shape fixture: point 1:1, polyline, and three
  // triangles of which 2 and 4 contain 1:1
  private def fiveShapes(): ShapeIndex = {
    val index = new ShapeIndex()
    index.add(PointVectorShape(Array(pt(1, 1))))
    index.add(PolylineShape(Polyline.fromLatLngsDegrees(Seq((1, 1), (2, 2)))))
    index.add(LoopShape(Loop.parse("0:0, 0:3, 3:0")))
    index.add(LoopShape(Loop.parse("6:6, 6:9, 9:6")))
    index.add(LoopShape(Loop.parse("0:0, 0:4, 4:0")))
    index
  }

  private def pointIndex(p: Vec3): ShapeIndex = {
    val idx = new ShapeIndex()
    idx.add(PointVectorShape(Array(p)))
    idx
  }

  test("min index target: containing shapes via component sample points") {
    val query = new ClosestEdgeQuery(fiveShapes(), includeInteriors = true)
    val target = ClosestEdgeQuery.ShapeIndexTarget(pointIndex(pt(1, 1)))
    val rs = query.findClosestEdges(target, 10)
    assert(rs.filter(_.edgeId == -1).map(_.shapeId) === Seq(2, 4))
  }

  test("empty and full polygon targets (EmptyAndFull protocol)") {
    val queryIdx = new ShapeIndex()
    queryIdx.add(LaxPolygonShape(Array.empty)) // empty polygon, id 0
    queryIdx.add(LaxPolygonShape(Array(Array.empty[Vec3]))) // full, id 1
    def interiorHits(t: ClosestEdgeQuery.DistanceTarget): Seq[Int] = {
      val q = new ClosestEdgeQuery(queryIdx, includeInteriors = true)
      q.findClosestEdges(t, 5).filter(_.edgeId == -1).map(_.shapeId)
    }
    // a point target: only the full polygon contains it
    assert(interiorHits(ClosestEdgeQuery.ShapeIndexTarget(
      pointIndex(pt(1, 1)))) === Seq(1))
    // a full-polygon target: its reference point reports, hitting only
    // the full query polygon
    val fullIdx = new ShapeIndex()
    fullIdx.add(LaxPolygonShape(Array(Array.empty[Vec3])))
    assert(interiorHits(ClosestEdgeQuery.ShapeIndexTarget(fullIdx)) === Seq(1))
    // an empty-polygon target has no components: nothing reports
    val emptyIdx = new ShapeIndex()
    emptyIdx.add(LaxPolygonShape(Array.empty))
    assert(interiorHits(ClosestEdgeQuery.ShapeIndexTarget(emptyIdx)) === Seq.empty)
  }

  test("min index target: strict update-when-equal") {
    val target = ClosestEdgeQuery.ShapeIndexTarget(
      pointIndex(pt(1, 0)), includeInteriors = false)
    val (d1, ok1) = target.updateMinDistance(pt(0, -1), pt(0, 1),
      ChordAngle.Straight + 1)
    assert(ok1)
    assert(!target.updateMinDistance(pt(0, -1), pt(0, 1), d1)._2)
  }

  test("max index target: strict update-when-equal and antipodal interiors") {
    val target = FurthestEdgeQuery.ShapeIndexTarget(
      pointIndex(pt(1, 0)), includeInteriors = false)
    val (d1, ok1) = target.updateMaxDistance(pt(0, -1), pt(0, 1), -1.0)
    assert(ok1)
    assert(!target.updateMaxDistance(pt(0, -1), pt(0, 1), d1)._2)
    // interior protocol: polygons containing the antipode of any target
    // component report at Straight
    val far = new FurthestEdgeQuery(fiveShapes(), includeInteriors = true)
    val anti = FurthestEdgeQuery.ShapeIndexTarget(pointIndex(pt(1, 1) * -1))
    val rs = far.findFurthestEdges(anti, 10)
    assert(rs.filter(_.edgeId == -1).map(_.shapeId) === Seq(2, 4))
  }

  test("index-to-index distances match brute force over edge pairs") {
    val rng = new scala.util.Random(606)
    def chainIndex(n: Int, baseLat: Double, baseLng: Double): ShapeIndex = {
      val idx = new ShapeIndex()
      var lat = baseLat; var lng = baseLng
      idx.add(PolylineShape(new Polyline(Array.fill(n) {
        lat += rng.nextDouble() - 0.5; lng += rng.nextDouble() - 0.5
        pt(lat, lng)
      })))
      idx
    }
    for (_ <- 0 until 20) {
      val a = chainIndex(4 + rng.nextInt(5), 10, 10)
      val b = chainIndex(4 + rng.nextInt(5), 10 + rng.nextDouble() * 20,
        10 + rng.nextDouble() * 20)
      def edges(idx: ShapeIndex): Seq[(Vec3, Vec3)] = {
        val out = scala.collection.mutable.ArrayBuffer[(Vec3, Vec3)]()
        val it = new EdgeIterator(idx)
        while (!it.done) { out += it.edge; it.next() }
        out.toSeq
      }
      val bruteMin = (for ((a0, a1) <- edges(a); (b0, b1) <- edges(b))
        yield EdgeDistances.edgePairMinDistance(a0, a1, b0, b1)).min
      val bruteMax = (for ((a0, a1) <- edges(a); (b0, b1) <- edges(b))
        yield EdgeDistances.edgePairMaxDistance(a0, a1, b0, b1)).max
      val qMin = new ClosestEdgeQuery(a, includeInteriors = false)
        .findClosestEdges(
          ClosestEdgeQuery.ShapeIndexTarget(b, includeInteriors = false), 1)
      assert(math.abs(qMin.head.distance - bruteMin) < 1e-15)
      val qMax = new FurthestEdgeQuery(a, includeInteriors = false)
        .findFurthestEdges(
          FurthestEdgeQuery.ShapeIndexTarget(b, includeInteriors = false), 1)
      assert(math.abs(qMax.head.distance - bruteMax) < 1e-15)
    }
  }
}
