package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Remaining loop_test.go protocols not covered by LoopSpec /
  * LoopRelationsSpec: the full allLoops fixture set with Gauss-Bonnet
  * area consistency, turning-angle goldens with rotation/inversion
  * invariance, normalization-vs-containment compatibility, the
  * bound-too-tight regression (ContainsMatchesCrossingSign), and the
  * cell-vs-loop bound conservatism note (FromCell).
  */
class LoopProtocolSpec extends AnyFunSuite {

  private def mk(s: String) = Loop.parse(s)

  // loop_test.go:30-160 fixture set
  private val northHemi3 = mk("0:-180, 0:-60, 0:60")
  private val southHemi = mk("0:90, 0:0, 0:-90, 0:-180")
  private val westHemi = mk("0:-180, -90:0, 0:0, 90:0")
  private val eastHemi = mk("90:0, 0:0, -90:0, 0:-180")
  private val nearHemi = mk("0:-90, -90:0, 0:90, 90:0")
  private val farHemi = mk("90:0, 0:90, -90:0, 0:-90")
  private val candyCane = mk("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
  private val smallNECW = mk("35:20, 45:20, 40:25")
  private val arctic80 = mk("80:-150, 80:-30, 80:90")
  private val antarctic80 = mk("-80:120, -80:0, -80:-120")
  private val lineTriangle = mk("0:1, 0:2, 0:3")
  private val skinnyChevron = mk("0:0, -1e-320:80, 0:1e-320, 1e-320:80")
  private val loopA = mk("0:178, -1:180, 0:-179, 1:-180")
  private val loopB = mk("0:179, -1:180, 0:-178, 1:-180")
  private val aIntersectB = mk("0:179, -1:180, 0:-179, 1:-180")
  private val aUnionB = mk("0:178, -1:180, 0:-178, 1:-180")
  private val aMinusB = mk("0:178, -1:180, 0:179, 1:-180")
  private val bMinusA = mk("0:-179, -1:180, 0:-178, 1:-180")
  private val loopC = mk("0:178, 0:180, -1:180, 0:-179, 1:-179, 1:-180")
  private val loopD = mk("0:178, -1:178, -1:180, 0:-179, 1:-179, 1:-180")
  private val loopE = mk("0:30, 0:34, 0:36, 0:39, 0:41, 0:44, 30:44, 30:30")
  private val loopF = mk("0:30, -30:30, -30:44, 0:44, 0:41, 0:39, 0:36, 0:34")
  private val loopG = mk("0:30, 0:34, 10:34, 10:36, 0:36, 0:39, 10:39, 10:41, 0:41, 0:44, 30:44, 30:30")
  private val loopH = mk("0:30, 0:34, -10:34, -10:36, 0:36, 0:39, 10:39, 10:41, 0:41, 0:44, 30:44, 30:30")
  private val loopI = mk("10:34, 0:34, -10:34, -10:36, 0:36, 10:36")

  private val allLoops: Seq[Loop] = Seq(
    Loop.empty, Loop.full, mk("0:-180, 0:-90, 0:0, 0:90") /* northHemi */,
    northHemi3, southHemi, westHemi, eastHemi, nearHemi, farHemi,
    candyCane, smallNECW, arctic80, antarctic80, lineTriangle,
    skinnyChevron, loopA, loopB, aIntersectB, aUnionB, aMinusB, bMinusA,
    loopC, loopD, loopE, loopF, loopG, loopH, loopI)

  private def rotate(l: Loop): Loop =
    Loop.fromPoints(l.vertices.drop(1) ++ l.vertices.take(1))

  test("area is consistent with the turning angle (Gauss-Bonnet)") {
    for ((loop, i) <- allLoops.zipWithIndex) {
      val area = loop.area
      val gauss = 2 * math.Pi - loop.turningAngle
      assert(math.abs(area - gauss) <= 1e-9, s"loop $i: $area vs $gauss")
    }
  }

  test("turning angle goldens with rotation/inversion invariance") {
    val cases = Seq(
      (Loop.empty, 2 * math.Pi), (Loop.full, -2 * math.Pi),
      (northHemi3, 0.0), (westHemi, 0.0),
      (candyCane, 4.69364376125922),
      (lineTriangle, 2 * math.Pi), (skinnyChevron, 2 * math.Pi))
    for ((loop, want) <- cases) {
      assert(math.abs(loop.turningAngle - want) < 1e-14,
        s"turningAngle golden for $want")
      val expected = loop.turningAngle
      var copy = loop
      for (_ <- loop.vertices.indices) {
        // identical under rotation; sign-inverted under reversal
        assert(copy.inverted.turningAngle === -expected)
        copy = rotate(copy)
        assert(copy.turningAngle === expected)
      }
    }
  }

  test("turning angle error stays linear on a 20k-vertex spiral") {
    // loop_test.go:1000-1035: narrow double-armed spiral at the pole;
    // partial turning-angle sums get huge but the result must stay
    // accurate to ~linear-in-n error.
    val armPoints = 10000
    val armRadius = 0.01
    val vertices = new Array[Vec3](2 * armPoints)
    vertices(armPoints) = Vec3(0, 0, 1)
    for (i <- 0 until armPoints) {
      val angle = (2 * math.Pi / 3) * i
      val x = math.cos(angle)
      val y = math.sin(angle)
      val r1 = i * armRadius / armPoints
      val r2 = (i + 1.5) * armRadius / armPoints
      vertices(armPoints - i - 1) = Vec3(r1 * x, r1 * y, 1.0).normalize
      vertices(armPoints + i) = Vec3(r2 * x, r2 * y, 1.0).normalize
    }
    val spiral = Loop.fromPoints(vertices)
    assert(math.abs(spiral.turningAngle - (2 * math.Pi - spiral.area)) <
      0.01 * 1e-14 * 2 * armPoints + 1e-8)
  }

  test("normalization is compatible with containment") {
    val p = LatLng.toPointDegrees(40, 40)
    for (loop <- Seq(lineTriangle, skinnyChevron)) {
      val flip = loop.inverted
      assert(loop.isNormalized !== loop.containsPoint(p))
      assert(flip.isNormalized !== flip.containsPoint(p))
      assert(loop.isNormalized !== flip.isNormalized,
        "a loop and its invert cannot both be normalized")
      assert(!flip.normalized.containsPoint(p))
    }
  }

  test("containsPoint matches crossing sign near a too-tight bound") {
    // loop_test.go TestLoopContainsMatchesCrossingSign: a Cell-based
    // loop and a grandchild vertex a0; the edge origin->a0 crosses
    // exactly one loop edge, so exactly one endpoint is inside.
    val cellId = CellId.parent(
      CellId.fromPoint(Vec3(1, 1, 1).normalize.x,
        Vec3(1, 1, 1).normalize.y, Vec3(1, 1, 1).normalize.z), 21)
    val children = CellId.children(cellId)
    val points = children.map(c => CellId.toPoint(c).normalize)
    val loop = Loop.fromPoints(points)
    val grandchild = CellId.children(children(0))(2)
    val a0 = Cell.fromId(grandchild).vertex(0)
    assert(a0 != points(0), "a0 must differ from points[0] by rounding")

    val origin = EdgeCrossings.originPoint
    val crosser = new EdgeCrosser(a0, origin)
    val signs = (0 until 4).map(i =>
      crosser.crossingSignTo(loop.vertex(i), loop.vertex(i + 1)))
    assert(signs.count(_ == EdgeCrossings.Cross) === 1,
      s"expected exactly one crossing, got $signs")
    assert(!loop.containsPoint(origin))
    assert(loop.containsPoint(a0),
      "regression: bound too tight caused a false negative here")
  }

  test("loop bound from a cell is less conservative than the cell bound") {
    val cell = Cell.fromId(CellId.fromLatLngDegrees(40.565459, -74.645276))
    val loopFromCell = Loop.fromPoints(Array.tabulate(4)(cell.vertex))
    assert(!loopFromCell.bound.containsRect(cell.rectBound),
      "cell bounds must be more conservative than the loop bounds")
  }
}
