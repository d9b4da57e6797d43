package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The three vertex-model truth tables of contains_point_query_test.go
  * over the fixture "0:0 # -1:1, 1:1 # 0:5, 0:7, 2:6" (a point, a
  * polyline, and a triangle): Open excludes every vertex, SemiOpen
  * contains exactly one of a tiling's shared vertices (0:7 here), and
  * Closed contains all boundary vertices including polyline endpoints
  * and the isolated point.
  */
class ContainsPointQueryProtocolSpec extends AnyFunSuite {

  private def pt(lat: Double, lng: Double) = LatLng.toPointDegrees(lat, lng)

  private def fixture(): ShapeIndex = {
    val index = new ShapeIndex()
    index.add(PointVectorShape(Array(pt(0, 0))))
    index.add(PolylineShape(Polyline.fromLatLngsDegrees(Seq((-1, 1), (1, 1)))))
    index.add(LoopShape(Loop.parse("0:5, 0:7, 2:6")))
    index
  }

  private def run(model: Int, cases: Seq[((Double, Double), Boolean)]): Unit = {
    val q = new ContainsPointQuery(fixture(), model)
    for ((((la, ln), want), i) <- cases.zipWithIndex)
      assert(q.contains(pt(la, ln)) === want, s"model $model case $i ($la:$ln)")
  }

  test("Open model excludes all vertices") {
    run(VertexModel.Open, Seq(
      (0.0, 0.0) -> false, (-1.0, 1.0) -> false, (1.0, 1.0) -> false,
      (0.0, 2.0) -> false, (0.0, 3.0) -> false, (0.0, 5.0) -> false,
      (0.0, 7.0) -> false, (2.0, 6.0) -> false, (1.0, 6.0) -> true,
      (10.0, 10.0) -> false))
    val q = new ContainsPointQuery(fixture(), VertexModel.Open)
    assert(!q.shapeContains(1, pt(1, 6)))
    assert(q.shapeContains(2, pt(1, 6)))
    assert(!q.shapeContains(2, pt(0, 5)))
    assert(!q.shapeContains(2, pt(0, 7)))
  }

  test("SemiOpen model contains exactly the owned vertex") {
    run(VertexModel.SemiOpen, Seq(
      (0.0, 0.0) -> false, (-1.0, 1.0) -> false, (1.0, 1.0) -> false,
      (0.0, 2.0) -> false, (0.0, 5.0) -> false,
      (0.0, 7.0) -> true, // the vertex this triangle owns
      (2.0, 6.0) -> false, (1.0, 6.0) -> true, (10.0, 10.0) -> false))
  }

  test("Closed model contains every boundary vertex") {
    run(VertexModel.Closed, Seq(
      (0.0, 0.0) -> true, (-1.0, 1.0) -> true, (1.0, 1.0) -> true,
      (0.0, 2.0) -> false, (0.0, 5.0) -> true, (0.0, 7.0) -> true,
      (2.0, 6.0) -> true, (1.0, 6.0) -> true, (10.0, 10.0) -> false))
    val q = new ContainsPointQuery(fixture(), VertexModel.Closed)
    assert(!q.shapeContains(1, pt(1, 6)))
    assert(q.shapeContains(2, pt(1, 6)))
    assert(q.shapeContains(2, pt(0, 5)))
    assert(q.shapeContains(2, pt(0, 7)))
  }
}
