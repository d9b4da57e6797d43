package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Loop x Loop relation truth tables ported from the reference
  * (/root/reference/s2/loop_test.go:807-1090 TestLoopRelations and its
  * nested/disjoint/covering/overlapping pair helpers, fixtures
  * loop_test.go:29-131).
  */
class LoopRelationsSpec extends AnyFunSuite {

  private def L(s: String) = Loop.parse(s)

  lazy val northHemi = L("0:-180, 0:-90, 0:0, 0:90")
  lazy val northHemi3 = L("0:-180, 0:-60, 0:60")
  lazy val southHemi = L("0:90, 0:0, 0:-90, 0:-180")
  lazy val westHemi = L("0:-180, -90:0, 0:0, 90:0")
  lazy val eastHemi = L("90:0, 0:0, -90:0, 0:-180")
  lazy val farHemi = L("90:0, 0:90, -90:0, 0:-90")
  lazy val nearHemi = L("0:-90, -90:0, 0:90, 90:0")
  lazy val candyCane = L("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
  lazy val smallNECW = L("35:20, 45:20, 40:25")
  lazy val arctic80 = L("80:-150, 80:-30, 80:90")
  lazy val antarctic80 = L("-80:120, -80:0, -80:-120")
  lazy val loopA = L("0:178, -1:180, 0:-179, 1:-180")
  lazy val loopB = L("0:179, -1:180, 0:-178, 1:-180")
  lazy val aIntersectB = L("0:179, -1:180, 0:-179, 1:-180")
  lazy val aUnionB = L("0:178, -1:180, 0:-178, 1:-180")
  lazy val aMinusB = L("0:178, -1:180, 0:179, 1:-180")
  lazy val bMinusA = L("0:-179, -1:180, 0:-178, 1:-180")
  lazy val loopC = L("0:178, 0:180, -1:180, 0:-179, 1:-179, 1:-180")
  lazy val loopD = L("0:178, -1:178, -1:180, 0:-179, 1:-179, 1:-180")
  lazy val loopE = L("0:30, 0:34, 0:36, 0:39, 0:41, 0:44, 30:44, 30:30")
  lazy val loopF = L("0:30, -30:30, -30:44, 0:44, 0:41, 0:39, 0:36, 0:34")
  lazy val loopG = L("0:30, 0:34, 10:34, 10:36, 0:36, 0:39, 10:39, 10:41, 0:41, 0:44, 30:44, 30:30")
  lazy val loopH = L("0:30, 0:34, -10:34, -10:36, 0:36, 0:39, 10:39, 10:41, 0:41, 0:44, 30:44, 30:30")
  lazy val loopI = L("10:34, 0:34, -10:34, -10:36, 0:36, 10:36")
  lazy val containingLoop = L("-38:-135, -38:149, 77:149, 77:-135")
  lazy val innerTile = L(
    "37.99616267972809:13.007812500000002, 37.99616267972809:13.359375000000002, " +
      "38.272819658516866:13.359375000000002, 38.272819658516866:13.007812500000002")
  lazy val extendedTile = L(
    "37.99616267972809:13.007812500000002, 37.99616267972809:13.559375000000002, " +
      "38.472819658516866:13.559375000000002, 38.472819658516866:13.007812500000002")

  // (a, b, contains, contained, disjoint, covers, sharedEdge)
  private case class T(a: Loop, b: Loop, contains: Boolean = false,
                       contained: Boolean = false, disjoint: Boolean = false,
                       covers: Boolean = false, sharedEdge: Boolean = false,
                       name: String = "")

  private lazy val table: Seq[T] = Seq(
    T(Loop.full, Loop.full, contains = true, contained = true, covers = true, sharedEdge = true, name = "full/full"),
    T(Loop.full, northHemi, contains = true, covers = true, name = "full/north"),
    T(Loop.full, Loop.empty, contains = true, disjoint = true, covers = true, name = "full/empty"),
    T(northHemi, Loop.full, contained = true, covers = true, name = "north/full"),
    T(northHemi, Loop.empty, contains = true, disjoint = true, name = "north/empty"),
    T(Loop.empty, Loop.full, contained = true, disjoint = true, covers = true, name = "empty/full"),
    T(Loop.empty, northHemi, contained = true, disjoint = true, name = "empty/north"),
    T(Loop.empty, Loop.empty, contains = true, contained = true, disjoint = true, name = "empty/empty"),
    T(northHemi, northHemi, contains = true, contained = true, sharedEdge = true, name = "north/north"),
    T(northHemi, southHemi, disjoint = true, covers = true, sharedEdge = true, name = "north/south"),
    T(northHemi, eastHemi, name = "north/east"),
    T(northHemi, arctic80, contains = true, name = "north/arctic"),
    T(northHemi, antarctic80, disjoint = true, name = "north/antarctic"),
    T(northHemi, candyCane, name = "north/candy"),
    T(northHemi3, northHemi3, contains = true, contained = true, sharedEdge = true, name = "north3/north3"),
    T(northHemi3, eastHemi, name = "north3/east"),
    T(northHemi3, arctic80, contains = true, name = "north3/arctic"),
    T(northHemi3, antarctic80, disjoint = true, name = "north3/antarctic"),
    T(northHemi3, candyCane, name = "north3/candy"),
    T(southHemi, northHemi, disjoint = true, covers = true, sharedEdge = true, name = "south/north"),
    T(southHemi, southHemi, contains = true, contained = true, sharedEdge = true, name = "south/south"),
    T(southHemi, farHemi, name = "south/far"),
    T(southHemi, arctic80, disjoint = true, name = "south/arctic"),
    T(southHemi, antarctic80, contains = true, name = "south/antarctic"),
    T(southHemi, candyCane, name = "south/candy"),
    T(candyCane, northHemi, name = "candy/north"),
    T(candyCane, southHemi, name = "candy/south"),
    T(candyCane, arctic80, disjoint = true, name = "candy/arctic"),
    T(candyCane, antarctic80, disjoint = true, name = "candy/antarctic"),
    T(candyCane, candyCane, contains = true, contained = true, sharedEdge = true, name = "candy/candy"),
    T(nearHemi, westHemi, name = "near/west"),
    T(smallNECW, southHemi, contains = true, name = "smallNECW/south"),
    T(smallNECW, westHemi, contains = true, name = "smallNECW/west"),
    T(smallNECW, northHemi, covers = true, name = "smallNECW/north"),
    T(smallNECW, eastHemi, covers = true, name = "smallNECW/east"),
    T(loopA, loopA, contains = true, contained = true, sharedEdge = true, name = "A/A"),
    T(loopA, loopB, name = "A/B"),
    T(loopA, aIntersectB, contains = true, sharedEdge = true, name = "A/AnB"),
    T(loopA, aUnionB, contained = true, sharedEdge = true, name = "A/AuB"),
    T(loopA, aMinusB, contains = true, sharedEdge = true, name = "A/A-B"),
    T(loopA, bMinusA, disjoint = true, sharedEdge = true, name = "A/B-A"),
    T(loopB, loopA, name = "B/A"),
    T(loopB, loopB, contains = true, contained = true, sharedEdge = true, name = "B/B"),
    T(loopB, aIntersectB, contains = true, sharedEdge = true, name = "B/AnB"),
    T(loopB, aUnionB, contained = true, sharedEdge = true, name = "B/AuB"),
    T(loopB, aMinusB, disjoint = true, sharedEdge = true, name = "B/A-B"),
    T(loopB, bMinusA, contains = true, sharedEdge = true, name = "B/B-A"),
    T(aIntersectB, loopA, contained = true, sharedEdge = true, name = "AnB/A"),
    T(aIntersectB, loopB, contained = true, sharedEdge = true, name = "AnB/B"),
    T(aIntersectB, aIntersectB, contains = true, contained = true, sharedEdge = true, name = "AnB/AnB"),
    T(aIntersectB, aUnionB, contained = true, name = "AnB/AuB"),
    T(aIntersectB, aMinusB, disjoint = true, sharedEdge = true, name = "AnB/A-B"),
    T(aIntersectB, bMinusA, disjoint = true, sharedEdge = true, name = "AnB/B-A"),
    T(aUnionB, loopA, contains = true, sharedEdge = true, name = "AuB/A"),
    T(aUnionB, loopB, contains = true, sharedEdge = true, name = "AuB/B"),
    T(aUnionB, aIntersectB, contains = true, name = "AuB/AnB"),
    T(aUnionB, aUnionB, contains = true, contained = true, sharedEdge = true, name = "AuB/AuB"),
    T(aUnionB, aMinusB, contains = true, sharedEdge = true, name = "AuB/A-B"),
    T(aUnionB, bMinusA, contains = true, sharedEdge = true, name = "AuB/B-A"),
    T(aMinusB, loopA, contained = true, sharedEdge = true, name = "A-B/A"),
    T(aMinusB, loopB, disjoint = true, sharedEdge = true, name = "A-B/B"),
    T(aMinusB, aIntersectB, disjoint = true, sharedEdge = true, name = "A-B/AnB"),
    T(aMinusB, aUnionB, contained = true, sharedEdge = true, name = "A-B/AuB"),
    T(aMinusB, aMinusB, contains = true, contained = true, sharedEdge = true, name = "A-B/A-B"),
    T(aMinusB, bMinusA, disjoint = true, name = "A-B/B-A"),
    T(bMinusA, loopA, disjoint = true, sharedEdge = true, name = "B-A/A"),
    T(bMinusA, loopB, contained = true, sharedEdge = true, name = "B-A/B"),
    T(bMinusA, aIntersectB, disjoint = true, sharedEdge = true, name = "B-A/AnB"),
    T(bMinusA, aUnionB, contained = true, sharedEdge = true, name = "B-A/AuB"),
    T(bMinusA, aMinusB, disjoint = true, name = "B-A/A-B"),
    T(bMinusA, bMinusA, contains = true, contained = true, sharedEdge = true, name = "B-A/B-A"),
    // crossings at two ends of a shared boundary segment
    T(loopA, loopC, sharedEdge = true, name = "A/C"),
    T(loopC, loopA, sharedEdge = true, name = "C/A"),
    T(loopA, loopD, contained = true, sharedEdge = true, name = "A/D"),
    T(loopD, loopA, contains = true, sharedEdge = true, name = "D/A"),
    T(loopE, loopF, disjoint = true, sharedEdge = true, name = "E/F"),
    T(loopE, loopG, contains = true, sharedEdge = true, name = "E/G"),
    T(loopE, loopH, sharedEdge = true, name = "E/H"),
    T(loopE, loopI, name = "E/I"),
    T(loopF, loopG, disjoint = true, sharedEdge = true, name = "F/G"),
    T(loopF, loopH, sharedEdge = true, name = "F/H"),
    T(loopF, loopI, name = "F/I"),
    T(loopG, loopH, contained = true, sharedEdge = true, name = "G/H"),
    T(loopH, loopG, contains = true, sharedEdge = true, name = "H/G"),
    T(loopG, loopI, disjoint = true, sharedEdge = true, name = "G/I"),
    T(loopH, loopI, contains = true, sharedEdge = true, name = "H/I"),
    // golang regression cases
    T(containingLoop, innerTile, contains = true, name = "containing/inner"),
    T(containingLoop, extendedTile, contains = true, name = "containing/extended")
  )

  private def oneNestedPair(a: Loop, b: Loop, ctx: String): Unit = {
    assert(a.contains(b), s"$ctx: a.contains(b)")
    assert(b.contains(a) === a.boundaryEqual(b), s"$ctx: b.contains(a)")
    assert(a.intersects(b) === !b.isEmpty, s"$ctx: a.intersects(b)")
    assert(b.intersects(a) === !b.isEmpty, s"$ctx: b.intersects(a)")
  }

  private def oneDisjointPair(a: Loop, b: Loop, ctx: String): Unit = {
    assert(!a.intersects(b), s"$ctx: a.intersects(b)")
    assert(!b.intersects(a), s"$ctx: b.intersects(a)")
    assert(a.contains(b) === b.isEmpty, s"$ctx: a.contains(b)")
    assert(b.contains(a) === a.isEmpty, s"$ctx: b.contains(a)")
  }

  private def oneCoveringPair(a: Loop, b: Loop, ctx: String): Unit = {
    assert(a.contains(b) === a.isFull, s"$ctx: a.contains(b)")
    assert(b.contains(a) === b.isFull, s"$ctx: b.contains(a)")
    val complementary = a.inverted.boundaryEqual(b)
    assert(a.intersects(b) === !complementary, s"$ctx: a.intersects(b)")
    assert(b.intersects(a) === !complementary, s"$ctx: b.intersects(a)")
  }

  private def nestedPair(a: Loop, b: Loop, ctx: String): Unit = {
    oneNestedPair(a, b, s"$ctx nested")
    oneNestedPair(b.inverted, a.inverted, s"$ctx nested-inv")
    oneDisjointPair(a.inverted, b, s"$ctx disjoint-inv")
    oneCoveringPair(a, b.inverted, s"$ctx covering-inv")
  }

  private def oneOverlappingPair(a: Loop, b: Loop, ctx: String): Unit = {
    assert(!a.contains(b), s"$ctx: a.contains(b)")
    assert(!b.contains(a), s"$ctx: b.contains(a)")
    assert(a.intersects(b), s"$ctx: a.intersects(b)")
    assert(b.intersects(a), s"$ctx: b.intersects(a)")
  }

  test("loop relation truth table (loop_test.go TestLoopRelations)") {
    for (t <- table) {
      val ctx = t.name
      if (t.contains) nestedPair(t.a, t.b, ctx)
      if (t.contained) nestedPair(t.b, t.a, s"$ctx rev")
      if (t.covers) nestedPair(t.a, t.b.inverted, s"$ctx covers")
      if (t.disjoint) nestedPair(t.a.inverted, t.b, s"$ctx disjoint")
      else if (!t.contains && !t.contained && !t.covers) {
        oneOverlappingPair(t.a, t.b, s"$ctx overlap")
        oneOverlappingPair(t.a.inverted, t.b.inverted, s"$ctx overlap-ii")
        oneOverlappingPair(t.a.inverted, t.b, s"$ctx overlap-ib")
        oneOverlappingPair(t.a, t.b.inverted, s"$ctx overlap-ai")
      }
      if (!t.sharedEdge && (t.contains || t.contained || t.disjoint)) {
        assert(t.a.contains(t.b) === t.a.containsNested(t.b),
          s"$ctx: Contains == ContainsNested when no shared edges")
      }
      var comparison = 0
      if (t.contains || (t.covers && !t.sharedEdge)) comparison = 1
      if (t.disjoint || (t.contained && !t.sharedEdge)) comparison = -1
      if (!t.a.isEmpty && !t.b.isEmpty) {
        assert(t.a.compareBoundary(t.b) === comparison, s"$ctx: compareBoundary")
      }
    }
  }

  test("polygon relations: annulus fixtures, nesting and hole semantics") {
    val c = LatLng.toPointDegrees(40.0, -100.0)
    def ring(rKm: Double, n: Int = 64) =
      Loop.regularLoop(c, Earth.angleFromMeters(rKm * 1000), n)
    val disc200 = Polygon.fromLoops(Seq(ring(200)))
    val disc50 = Polygon.fromLoops(Seq(ring(50)))
    val annulus = Polygon.fromLoops(Seq(ring(200), ring(80)))
    val discFar = Polygon.fromLoops(Seq(
      Loop.regularLoop(LatLng.toPointDegrees(-30.0, 60.0),
        Earth.angleFromMeters(100000), 64)))

    assert(annulus.loops(1).isHole, "inner ring must get depth 1")
    assert(disc200.contains(disc50))
    assert(!disc50.contains(disc200))
    assert(disc200.intersects(disc50))
    // the hole excludes the small disc entirely
    assert(!annulus.contains(disc50))
    assert(!annulus.intersects(disc50))
    // a mid-radius ring polygon lies inside the annulus
    val mid = Polygon.fromLoops(Seq(ring(150), ring(120)))
    assert(annulus.contains(mid))
    assert(mid.intersects(annulus))
    // a disc spanning the hole boundary intersects but is not contained
    val spanning = Polygon.fromLoops(Seq(
      Loop.regularLoop(LatLng.toPointDegrees(40.0, -98.5),
        Earth.angleFromMeters(100000), 64)))
    assert(annulus.intersects(spanning))
    assert(!annulus.contains(spanning))
    // disjoint far-away polygon
    assert(!annulus.intersects(discFar))
    assert(!annulus.contains(discFar))
    // single-loop path delegates to Loop relations
    assert(disc200.contains(Polygon.fromLoops(Seq(ring(199)))))
  }

  test("polygon nesting depth when a hole shares a vertex with its shell") {
    // A hole touching its shell at a vertex is legal S2 geometry; depth
    // assignment must use the wedge machinery (containsNested), because
    // point-in-loop parity of a boundary vertex is ill-defined.
    val shell = Loop.parse("0:0, 0:10, 10:10, 10:0")
    // Hole shares shell vertex (0,0); other vertices strictly inside.
    // CW as seen from outside? Keep it normalized (area < 2pi) and CCW:
    val hole = Loop.parse("0:0, 2:4, 4:2")
    val poly = Polygon.fromLoops(Seq(shell, hole))
    assert(poly.loops(0).depth === 0, "shell depth")
    assert(poly.loops(1).depth === 1, "hole depth")
    assert(poly.loops(1).isHole)
    // Interior point away from the hole is contained; a point inside the
    // hole is not.
    assert(poly.containsPoint(LatLng.toPointDegrees(8.0, 8.0)))
    assert(!poly.containsPoint(LatLng.toPointDegrees(1.8, 1.8)))
    // bound must still be the shell's bound (a flipped depth would drop
    // the shell from the union)
    assert(poly.bound.containsLatLng(math.toRadians(9.9), math.toRadians(9.9)))
  }
}
