package graft.core

/** Multi-loop polygon with even/odd hole semantics: a point is inside iff
  * it is contained by an odd number of loops... more precisely, the
  * reference defines containment as the parity over all loops
  * (/root/reference/s2/polygon.go:591-613: "any-loop parity via shared
  * index"). Loops may be shells (CCW) or holes (CW); parity handles
  * arbitrary nesting without tracking depth.
  */
final class Polygon(val loops: Array[Loop]) extends S2Region {

  val bound: SphereRect = {
    // Union of the bounds of the loops at depth 0 would need nesting;
    // parity semantics make the union of all loop bounds a safe bound
    // for any point that can be contained.
    var b = SphereRect.empty
    loops.foreach(l => b = b.union(l.bound))
    b
  }

  def numLoops: Int = loops.length

  /** XOR of per-loop containment (polygon.go:706-729 semantics). */
  def containsPoint(p: Vec3): Boolean = {
    var inside = false
    var i = 0
    while (i < loops.length) {
      if (loops(i).bruteForceContainsPoint(p)) inside = !inside
      i += 1
    }
    inside
  }

  /** Area of the parity region: normalize every loop to its small (CCW)
    * interior, compute each loop's nesting depth by counting how many
    * other loops contain one of its vertices, and alternate signs with
    * depth (shell +, hole -, island-in-lake +, ...).
    */
  def area: Double = {
    val norm = loops.map(_.normalized)
    var total = 0.0
    for ((l, i) <- norm.zipWithIndex) {
      val depth = norm.indices.count(j =>
        j != i && norm(j).bruteForceContainsPoint(l.vertices(0)))
      total += (if (depth % 2 == 0) l.area else -l.area)
    }
    math.max(0, total)
  }

  def capBound: Cap = {
    if (loops.isEmpty) return Cap.empty
    var c = Cap.fromPoint(LatLng.toPoint(bound.lat.center, bound.lng.center))
    loops.foreach(_.vertices.foreach(v => c = c.addPoint(v)))
    c
  }

  def rectBound: SphereRect = bound

  def containsCell(cell: Cell): Boolean = {
    if (!bound.containsPoint(cell.center)) return false
    // The polygon contains the cell iff no loop boundary passes through it
    // (each loop either wholly contains the cell or is disjoint from it)
    // and one cell corner is inside the polygon.
    loops.forall(l => l.containsCell(cell) || !l.intersectsCell(cell)) &&
      containsPoint(cell.vertex(0))
  }

  def intersectsCell(cell: Cell): Boolean = {
    loops.exists(_.intersectsCell(cell)) || containsPoint(cell.vertex(0))
  }

  def cellUnionBound: Array[Long] = capBound.cellUnionBound
}

object Polygon {
  /** Build from loops; orientation is taken as given (shells CCW, holes
    * CW — parity containment is orientation-agnostic anyway).
    */
  def fromLoops(loops: Seq[Loop]): Polygon = new Polygon(loops.toArray)

  def fromLoopStrings(specs: Seq[String]): Polygon =
    fromLoops(specs.map(Loop.parse))

  val empty: Polygon = new Polygon(Array.empty)
  val full: Polygon = new Polygon(Array(Loop.full))
}
