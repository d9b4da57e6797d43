package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Lax shapes (degeneracy-tolerant geometry) + referencePointForShape,
  * following the reference protocols (lax_loop_test.go,
  * lax_polygon_test.go DegenerateLoops/InvertedLoops, shapeutil
  * reference-point machinery).
  */
class LaxShapesSpec extends AnyFunSuite {

  private def pts(s: String): Array[Vec3] =
    s.split(",").map(_.trim).filter(_.nonEmpty).map { tok =>
      val Array(lat, lng) = tok.split(":").map(_.trim.toDouble)
      LatLng.toPointDegrees(lat, lng)
    }

  test("lax loop basics and containment (NonEmptyLoop protocol)") {
    val shape = LaxLoopShape(pts("0:0, 0:1, 1:1, 1:0"))
    assert(shape.numEdges === 4)
    assert(shape.dimension === 2)
    assert(shape.edge(3) === ((shape.vertices(3), shape.vertices(0))))
    // interior point is contained, exterior is not
    assert(ShapeUtil.containsBruteForce(shape, LatLng.toPointDegrees(0.5, 0.5)))
    assert(!ShapeUtil.containsBruteForce(shape, LatLng.toPointDegrees(5, 5)))
    assert(!ShapeUtil.containsBruteForce(shape, EdgeCrossings.originPoint))
  }

  test("single-vertex point loop has an empty interior") {
    val shape = LaxLoopShape(pts("3:4"))
    assert(shape.numEdges === 1)
    assert(shape.referencePoint._2 === false)
    assert(!ShapeUtil.containsBruteForce(shape, LatLng.toPointDegrees(3, 4.1)))
  }

  test("lax polyline permits degenerate and empty input") {
    assert(LaxPolylineShape(Array.empty[Vec3]).numEdges === 0)
    assert(LaxPolylineShape(pts("1:1")).numEdges === 0)
    val dup = LaxPolylineShape(pts("1:1, 1:1, 2:2"))
    assert(dup.numEdges === 2)
    assert(dup.edge(0)._1 === dup.edge(0)._2) // degenerate first edge
    assert(dup.dimension === 1)
  }

  test("lax polygon: empty, full, and single loop protocols") {
    val empty = LaxPolygonShape(Array.empty)
    assert(empty.numEdges === 0)
    assert(empty.referencePoint._2 === false)
    // full polygon: one empty chain, no edges
    val full = LaxPolygonShape(Array(Array.empty[Vec3]))
    assert(full.numEdges === 0)
    assert(full.referencePoint._2 === true)
    val single = LaxPolygonShape(Array(pts("0:0, 0:1, 1:1, 1:0")))
    assert(single.numEdges === 4)
    assert(!ShapeUtil.containsBruteForce(single, EdgeCrossings.originPoint))
    assert(ShapeUtil.containsBruteForce(single, LatLng.toPointDegrees(0.5, 0.5)))
  }

  test("lax polygon: shell with CW hole keeps interior on the left") {
    // MultiLoopPolygon protocol: CCW shell + CW hole
    val shape = LaxPolygonShape(Array(
      pts("0:0, 0:3, 3:3"), pts("1:1, 2:2, 1:2")))
    assert(shape.numEdges === 6)
    assert(!ShapeUtil.containsBruteForce(shape, EdgeCrossings.originPoint))
    // inside the shell, outside the hole
    assert(ShapeUtil.containsBruteForce(shape, LatLng.toPointDegrees(0.4, 2.0)))
    // inside the hole
    assert(!ShapeUtil.containsBruteForce(shape, LatLng.toPointDegrees(1.3, 1.8)))
  }

  test("degenerate loops define an empty region (DegenerateLoops protocol)") {
    val shape = LaxPolygonShape(Array(
      pts("1:1, 1:2, 2:2, 1:2, 1:3, 1:2, 1:1"),
      pts("0:0, 0:3, 0:6, 0:9, 0:6, 0:3, 0:0"),
      pts("5:5, 6:6")))
    assert(shape.referencePoint._2 === false)
  }

  test("inverted loops contain the origin (InvertedLoops protocol)") {
    val shape = LaxPolygonShape(Array(
      pts("1:2, 1:1, 2:2"), pts("3:4, 3:3, 4:4")))
    assert(ShapeUtil.containsBruteForce(shape, EdgeCrossings.originPoint))
  }

  test("lax shapes index and answer ContainsPointQuery like brute force") {
    val rng = new scala.util.Random(808)
    val index = new ShapeIndex()
    index.add(LaxLoopShape(pts("0:0, 0:2, 2:2, 2:0")))
    index.add(LaxPolygonShape(Array(pts("0:0, 0:3, 3:3"), pts("1:1, 2:2, 1:2"))))
    index.add(LaxPolylineShape(pts("0:0, 0:0, 1:4, 2:4")))
    index.add(LaxLoopShape(pts("1:1"))) // point loop
    val q = new ContainsPointQuery(index, VertexModel.SemiOpen)
    for (_ <- 0 until 1000) {
      val p = LatLng.toPointDegrees(rng.nextDouble() * 5 - 1,
        rng.nextDouble() * 5 - 1)
      val got = q.containingShapes(p).toSet
      val want = (0 until index.numShapes).filter(id =>
        ShapeUtil.containsBruteForce(index.shape(id), p)).toSet
      assert(got === want, s"containment mismatch at $p")
    }
  }
}
