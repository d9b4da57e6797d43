package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** CrossingEdgeQuery candidates/crossings verified against brute force
  * with the reference's adversarial edge generators
  * (crossing_edge_query_test.go:25-300): perturbed sub-edges lying along
  * cube edges and face axes, cap edges near the Hilbert-curve corner
  * vertex, and degenerate edges on cell vertices.
  */
class CrossingEdgeQuerySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(192837)

  /** Arbitrary independent edges as one shape (test helper mirroring the
    * reference's edgeVectorShape).
    */
  private final class EdgeVectorShape(
      val edgesList: scala.collection.mutable.ArrayBuffer[(Vec3, Vec3)] =
        scala.collection.mutable.ArrayBuffer[(Vec3, Vec3)]()) extends Shape {
    def add(a: Vec3, b: Vec3): Unit = edgesList += ((a, b))
    def numEdges: Int = edgesList.length
    def edge(e: Int): (Vec3, Vec3) = edgesList(e)
    def dimension: Int = 1
    def referencePoint: (Vec3, Boolean) = (EdgeCrossings.originPoint, false)
  }

  private def perturbAtDistance(distance: Double, a0: Vec3, b0: Vec3): Vec3 = {
    var x = EdgeDistances.interpolateAtDistance(distance, a0, b0)
    if (rng.nextBoolean()) {
      def bump(d: Double) =
        if (rng.nextBoolean()) Math.nextAfter(d, 1) else Math.nextAfter(d, -1)
      x = Vec3(bump(x.x), bump(x.y), bump(x.z)).normalize
    }
    x
  }

  private def generatePerturbedSubEdges(a0: Vec3, b0: Vec3,
                                        count: Int): Seq[(Vec3, Vec3)] = {
    val a = a0.normalize
    val b = b0.normalize
    val length0 = a.angle(b)
    Seq.fill(count) {
      val length = length0 * math.pow(1e-15, rng.nextDouble())
      val offset = (length0 - length) * rng.nextDouble()
      (perturbAtDistance(offset, a, b), perturbAtDistance(offset + length, a, b))
    }
  }

  private def samplePointFromCap(center: Vec3, radiusRad: Double): Vec3 = {
    val z = center
    val y = z.ortho
    val x = y.cross(z)
    val r = radiusRad * math.sqrt(rng.nextDouble())
    val theta = rng.nextDouble() * 2 * math.Pi
    val p = Vec3(math.sin(r) * math.cos(theta), math.sin(r) * math.sin(theta),
      math.cos(r))
    (x * p.x + y * p.y + z * p.z).normalize
  }

  private def generateCapEdges(center: Vec3, capRadius: Double,
                               maxLength: Double, count: Int): Seq[(Vec3, Vec3)] = {
    Seq.fill(count) {
      val c = samplePointFromCap(center, capRadius)
      val p1 = samplePointFromCap(c, 0.5 * maxLength)
      val p2 = samplePointFromCap(c, 0.5 * maxLength)
      (p1, p2)
    }
  }

  /** testCrossingEdgeQueryAllCrossings port: candidates must be a sorted
    * superset of all brute-force crossings for every edge.
    */
  private def checkAllCrossings(edges: Seq[(Vec3, Vec3)]): Unit = {
    val shape = new EdgeVectorShape()
    edges.foreach { case (a, b) => shape.add(a, b) }
    val index = new ShapeIndex(maxEdgesPerCell = 1) // force more subdivision
    index.add(shape)

    for ((a, b) <- edges) {
      val query = new CrossingEdgeQuery(index)
      val candidates = query.candidates(a, b, 0)
      assert(candidates.nonEmpty, "candidates should not be empty")
      assert(candidates == candidates.sorted, "candidates must be sorted")
      assert(candidates.head >= 0 && candidates.last < shape.numEdges)

      val candSet = candidates.toSet
      for (i <- 0 until shape.numEdges) {
        val (c, d) = shape.edge(i)
        val sign = EdgeCrossings.crossingSign(a, b, c, d)
        if (sign != EdgeCrossings.DoNotCross) {
          assert(candSet.contains(i),
            s"edge $i crosses (sign $sign) but is not a candidate")
        }
      }

      // crossings() agrees with the brute-force crossing signs
      val interior = query.crossings(a, b, 0, CrossingType.Interior).toSet
      val all = query.crossings(a, b, 0, CrossingType.All).toSet
      for (i <- 0 until shape.numEdges) {
        val (c, d) = shape.edge(i)
        val sign = EdgeCrossings.crossingSign(a, b, c, d)
        assert(interior.contains(i) === (sign == EdgeCrossings.Cross))
        assert(all.contains(i) === (sign != EdgeCrossings.DoNotCross))
      }
    }
  }

  test("perturbed cube-edge edges (padding correctness stress)") {
    for (_ <- 0 until 4) {
      val face = rng.nextInt(6)
      val scale = math.pow(1e-15, rng.nextDouble())
      val u = scale * 2 * rng.nextInt(2) - 1
      val v = scale * 2 * rng.nextInt(2) - 1
      val a = STUV.faceUVToXYZ(face, u, v)
      val b = a - STUV.unitNorm(face) * 2
      checkAllCrossings(generatePerturbedSubEdges(a, b, 20))
    }
  }

  test("perturbed cube-face-axis edges (child-boundary edges)") {
    for (_ <- 0 until 3) {
      val face = rng.nextInt(6)
      val scale = math.pow(1e-15, rng.nextDouble())
      val axis = if (rng.nextBoolean()) STUV.uAxis(face) else STUV.vAxis(face)
      val a = axis * scale + STUV.unitNorm(face)
      val b = axis * scale - STUV.unitNorm(face)
      checkAllCrossings(generatePerturbedSubEdges(a, b, 20))
    }
  }

  test("cap edges near the Hilbert-curve corner vertex") {
    checkAllCrossings(generateCapEdges(
      Vec3(-1, -1, 1).normalize, 1e-3, 1e-4, 300))
  }

  test("degenerate edge on a cell vertex is its own candidate") {
    for (_ <- 0 until 50) {
      val face = rng.nextInt(6)
      val level = rng.nextInt(CellId.MaxLevel + 1)
      val pos = (rng.nextLong() & (-1L >>> CellId.FaceBits)) &
        -CellId.lsbForLevel(level)
      val id = CellId.parent((face.toLong << CellId.PosBits) | pos | 1L, level)
      val v = Cell.fromId(id).vertex(0)
      checkAllCrossings(Seq((v, v)))
    }
  }
}
