package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Reference protocols from polyline_alignment_test.go (window
  * construction/upsample/dilate goldens, halfResolution, exact DP vs
  * brute force with the documented warp paths) plus approximate-path
  * and medoid coverage.
  */
class PolylineAlignmentSpec extends AnyFunSuite {
  import PolylineAlignment._

  private def pl(s: String): Polyline =
    if (s.isEmpty) new Polyline(Array(Vec3(1, 0, 0)))
    else Polyline.fromLatLngsDegrees(s.split(",").map(_.trim).map { tok =>
      val Array(lat, lng) = tok.split(":").map(_.trim.toDouble)
      (lat, lng)
    }.toSeq)

  private def strides(ss: (Int, Int)*): Array[ColumnStride] =
    ss.map { case (a, b) => ColumnStride(a, b) }.toArray

  test("window from strides (reference golden)") {
    val w = Window.fromStrides(strides((0, 3), (1, 4), (2, 4), (3, 6), (4, 6)))
    assert(w.isValid)
    assert(w.columnStride(0) === ColumnStride(0, 3))
    assert(w.columnStride(4) === ColumnStride(4, 6))
  }

  test("window debug string (reference golden)") {
    val w = Window.fromStrides(strides((0, 4), (0, 4), (0, 4), (0, 4)))
    assert(w.debugString ===
      " * * * *\n * * * *\n * * * *\n * * * *\n")
  }

  test("window upsample by factor of two (reference golden)") {
    val w = Window.fromStrides(strides((0, 3), (1, 4), (2, 4), (3, 6), (4, 6)))
    val up = w.upsample(10, 12)
    assert(up.debugString ===
      """ * * * * * * . . . . . .
        | * * * * * * . . . . . .
        | . . * * * * * * . . . .
        | . . * * * * * * . . . .
        | . . . . * * * * . . . .
        | . . . . * * * * . . . .
        | . . . . . . * * * * * *
        | . . . . . . * * * * * *
        | . . . . . . . . * * * *
        | . . . . . . . . * * * *
        |""".stripMargin)
  }

  test("window upsample x-axis by factor of three (reference golden)") {
    val w = Window.fromStrides(strides((0, 3), (1, 4), (2, 4), (3, 6), (4, 6)))
    val up = w.upsample(5, 18)
    assert(up.debugString ===
      """ * * * * * * * * * . . . . . . . . .
        | . . . * * * * * * * * * . . . . . .
        | . . . . . . * * * * * * . . . . . .
        | . . . . . . . . . * * * * * * * * *
        | . . . . . . . . . . . . * * * * * *
        |""".stripMargin)
  }

  test("window dilate radii 0, 1, 2, 100 (reference goldens)") {
    val w = Window.fromStrides(strides((0, 3), (2, 3), (2, 3), (2, 4), (3, 6)))
    assert(w.dilate(0).debugString ===
      " * * * . . .\n . . * . . .\n . . * . . .\n . . * * . .\n . . . * * *\n")
    assert(w.dilate(1).debugString ===
      " * * * * . .\n * * * * . .\n . * * * * .\n . * * * * *\n . * * * * *\n")
    assert(w.dilate(2).debugString ===
      " * * * * * .\n * * * * * *\n * * * * * *\n * * * * * *\n * * * * * *\n")
    assert(w.dilate(100).debugString ===
      " * * * * * *\n * * * * * *\n * * * * * *\n * * * * * *\n * * * * * *\n")
  }

  test("halfResolution takes even-index vertices (reference goldens)") {
    def verts(p: Polyline) = p.vertices.toSeq
    assert(verts(halfResolution(pl("0:0, 0:1, 0:2, 1:2"))) ===
      verts(pl("0:0, 0:2")))
    assert(verts(halfResolution(pl("0:0, 0:1, 0:2, 1:2, 3:5"))) ===
      verts(pl("0:0, 0:2, 3:5")))
  }

  // brute-force optimal alignment cost over the full distance matrix
  // (polyline_alignment_test.go:340-353)
  private def bruteForceCost(a: Polyline, b: Polyline, i: Int, j: Int): Double = {
    def d(i: Int, j: Int) = (a.vertices(i) - b.vertices(j)).norm
    if (i == 0 && j == 0) d(0, 0)
    else if (i == 0) bruteForceCost(a, b, i, j - 1) + d(i, j)
    else if (j == 0) bruteForceCost(a, b, i - 1, j) + d(i, j)
    else math.min(bruteForceCost(a, b, i - 1, j - 1),
      math.min(bruteForceCost(a, b, i - 1, j),
        bruteForceCost(a, b, i, j - 1))) + d(i, j)
  }

  test("exact alignment matches brute force on the reference cases") {
    val cases = Seq(
      ("1:1", "2:2", Seq((0, 0))),
      ("0:0", "0:0, 1:1, 2:2", Seq((0, 0), (0, 1), (0, 2))),
      ("0:0, 1:1, 2:2", "0:0", Seq((0, 0), (1, 0), (2, 0))),
      ("1:0, 5:0, 6:0, 9:0", "2:0, 7:0, 8:0",
        Seq((0, 0), (1, 1), (2, 1), (3, 2))),
      // distance (not squared) cost changes the optimal path here
      ("0.1:-0.1, 0.1:0, 0.1:0.1, -0.1:0.1", "0.1:-0.1, -0.1:-0.1, -0.1:0.1",
        Seq((0, 0), (1, 0), (2, 1), (3, 2))))
    for ((as, bs, wantPath) <- cases) {
      val a = pl(as); val b = pl(bs)
      val brute = bruteForceCost(a, b, a.vertices.length - 1, b.vertices.length - 1)
      val cost = exactVertexAlignmentCost(a, b)
      assert(math.abs(cost - brute) < 1e-12, s"cost($as, $bs)")
      val va = exactVertexAlignment(a, b)
      assert(math.abs(va.alignmentCost - brute) < 1e-12, s"alignment($as, $bs)")
      assert(va.warpPath === wantPath, s"path($as, $bs)")
    }
  }

  test("exact alignment matches brute force on random polylines") {
    val rng = new scala.util.Random(4242)
    for (_ <- 0 until 50) {
      def rand(n: Int) = new Polyline(Array.fill(n)(
        LatLng.toPointDegrees(rng.nextDouble() * 4, rng.nextDouble() * 4)))
      val a = rand(2 + rng.nextInt(6))
      val b = rand(2 + rng.nextInt(6))
      val brute = bruteForceCost(a, b, a.vertices.length - 1, b.vertices.length - 1)
      assert(math.abs(exactVertexAlignmentCost(a, b) - brute) < 1e-12)
      assert(math.abs(exactVertexAlignment(a, b).alignmentCost - brute) < 1e-12)
    }
  }

  test("approximate alignment stays near exact and is valid") {
    val rng = new scala.util.Random(99)
    def wander(n: Int): Polyline = {
      var lat = 10.0; var lng = 20.0
      new Polyline(Array.fill(n) {
        lat += rng.nextDouble() - 0.5; lng += rng.nextDouble() - 0.5
        LatLng.toPointDegrees(lat, lng)
      })
    }
    for (_ <- 0 until 10) {
      val a = wander(40 + rng.nextInt(30))
      val b = wander(40 + rng.nextInt(30))
      val exact = exactVertexAlignmentCost(a, b)
      val approx = approxVertexAlignment(a, b, radius = 2)
      // approx >= exact always; close for monotone wandering tracks
      assert(approx.alignmentCost >= exact - 1e-12)
      assert(approx.alignmentCost <= exact * 1.10 + 1e-12,
        s"approx ${approx.alignmentCost} vs exact $exact")
      // path endpoints pin the corners
      assert(approx.warpPath.head === ((0, 0)))
      assert(approx.warpPath.last ===
        ((a.vertices.length - 1, b.vertices.length - 1)))
    }
  }

  test("medoid picks the central polyline") {
    val base = pl("0:0, 0:1, 0:2, 0:3")
    val north = pl("0.5:0, 0.5:1, 0.5:2, 0.5:3")
    val south = pl("-0.5:0, -0.5:1, -0.5:2, -0.5:3")
    assert(medoidPolyline(Seq(north, base, south)) === 1)
    assert(medoidPolyline(Seq(north, base, south), approx = true) === 1)
  }
}
