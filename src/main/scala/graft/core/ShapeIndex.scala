package graft.core

/** Shape abstraction: geometry as an edge list with a dimension and a
  * reference point (/root/reference/s2/shape.go:157-269, reduced to the
  * surface the index needs; chains are implicit in the edge order).
  */
trait Shape {
  def numEdges: Int
  /** Edge e as (v0, v1). */
  def edge(e: Int): (Vec3, Vec3)
  /** 0 = points, 1 = polyline, 2 = polygon. */
  def dimension: Int
  /** (point, containedByShape) — the containment anchor
    * (shapeutil.go referencePointForShape).
    */
  def referencePoint: (Vec3, Boolean)
  /** One vertex per connected edge component (chain), for targets that
    * must test every component (min_distance_targets.go:310-345).
    */
  def chainStarts: Seq[Vec3] =
    if (numEdges == 0) Seq.empty else Seq(edge(0)._1)
}

final case class LoopShape(loop: Loop) extends Shape {
  def numEdges: Int = if (loop.isEmptyOrFull) 0 else loop.numVertices
  def edge(e: Int): (Vec3, Vec3) = (loop.vertex(e), loop.vertex(e + 1))
  def dimension: Int = 2
  def referencePoint: (Vec3, Boolean) =
    (EdgeCrossings.originPoint, loop.originInside)
}

final case class PolygonShape(polygon: Polygon) extends Shape {
  private val offsets: Array[Int] = {
    val o = new Array[Int](polygon.loops.length + 1)
    for (i <- polygon.loops.indices)
      o(i + 1) = o(i) + (if (polygon.loops(i).isEmptyOrFull) 0
        else polygon.loops(i).numVertices)
    o
  }
  def numEdges: Int = offsets.last
  def edge(e: Int): (Vec3, Vec3) = {
    var li = 0
    while (e >= offsets(li + 1)) li += 1
    val loop = polygon.loops(li)
    val k = e - offsets(li)
    (loop.vertex(k), loop.vertex(k + 1))
  }
  def dimension: Int = 2
  def referencePoint: (Vec3, Boolean) = {
    var inside = false
    polygon.loops.foreach(l => inside ^= l.originInside)
    (EdgeCrossings.originPoint, inside)
  }
  override def chainStarts: Seq[Vec3] =
    polygon.loops.toSeq.filter(!_.isEmptyOrFull).map(_.vertex(0))
}

final case class PolylineShape(polyline: Polyline) extends Shape {
  def numEdges: Int = math.max(0, polyline.vertices.length - 1)
  def edge(e: Int): (Vec3, Vec3) = (polyline.vertices(e), polyline.vertices(e + 1))
  def dimension: Int = 1
  def referencePoint: (Vec3, Boolean) = (EdgeCrossings.originPoint, false)
}

/** A set of points as a dimension-0 shape: edge e is the degenerate edge
  * (point e, point e) (shape.go PointVector semantics).
  */
final case class PointVectorShape(points: Array[Vec3]) extends Shape {
  def numEdges: Int = points.length
  def edge(e: Int): (Vec3, Vec3) = (points(e), points(e))
  def dimension: Int = 0
  def referencePoint: (Vec3, Boolean) = (EdgeCrossings.originPoint, false)
  override def chainStarts: Seq[Vec3] = points.toSeq
}

/** Closed vertex chain WITHOUT the Loop invariants — duplicate vertices,
  * degenerate (sliver) loops and single-vertex "point loops" are all
  * legal (lax_loop.go:15-85). numEdges == numVertices; containment is
  * defined by the reference-point machinery, which resolves degeneracies
  * through ContainsVertexQuery.
  */
final case class LaxLoopShape(vertices: Array[Vec3]) extends Shape {
  def numEdges: Int = vertices.length
  def edge(e: Int): (Vec3, Vec3) =
    (vertices(e), vertices(if (e + 1 == vertices.length) 0 else e + 1))
  def dimension: Int = 2
  def referencePoint: (Vec3, Boolean) = ShapeUtil.referencePointForShape(this)
}

/** Open vertex chain permitting degeneracies — adjacent duplicates and
  * self-intersections are legal (lax_polyline.go:15-54).
  */
final case class LaxPolylineShape(vertices: Array[Vec3]) extends Shape {
  def numEdges: Int = math.max(0, vertices.length - 1)
  def edge(e: Int): (Vec3, Vec3) = (vertices(e), vertices(e + 1))
  def dimension: Int = 1
  def referencePoint: (Vec3, Boolean) = (EdgeCrossings.originPoint, false)
}

/** Multi-loop polygon permitting degeneracies (lax_polygon.go:15-160):
  * loops are raw vertex chains with interiors on the left; an empty
  * chain list is the empty polygon, and a polygon whose chains are all
  * empty (zero edges but at least one chain) is the FULL polygon.
  */
final case class LaxPolygonShape(loops: Array[Array[Vec3]]) extends Shape {
  private val offsets: Array[Int] = {
    val o = new Array[Int](loops.length + 1)
    for (i <- loops.indices) o(i + 1) = o(i) + loops(i).length
    o
  }
  def numEdges: Int = offsets.last
  def edge(e: Int): (Vec3, Vec3) = {
    var li = 0
    while (e >= offsets(li + 1)) li += 1
    val k = e - offsets(li)
    val loop = loops(li)
    (loop(k), loop(if (k + 1 == loop.length) 0 else k + 1))
  }
  def dimension: Int = 2
  def referencePoint: (Vec3, Boolean) =
    if (numEdges == 0) (EdgeCrossings.originPoint, loops.nonEmpty)
    else ShapeUtil.referencePointForShape(this)
  override def chainStarts: Seq[Vec3] =
    loops.toSeq.filter(_.nonEmpty).map(_.head)
}

/** Iterator over every (shapeId, edgeId) of an index in order — the edge
  * counterpart of ShapeIndexIterator's cell walk
  * (shapeutil_edge_iterator.go:15-72); removed (null) shapes are skipped.
  */
final class EdgeIterator(index: ShapeIndex) {
  private var shapeIdV = -1
  private var numEdges = 0
  private var edgeIdV = -1
  next()

  def shapeId: Int = shapeIdV
  def edgeId: Int = edgeIdV
  def done: Boolean = shapeIdV >= index.numShapes
  def edge: (Vec3, Vec3) = index.shape(shapeIdV).edge(edgeIdV)

  def next(): Unit = {
    edgeIdV += 1
    while (edgeIdV >= numEdges) {
      shapeIdV += 1
      if (shapeIdV >= index.numShapes) return
      val shape = index.shape(shapeIdV)
      numEdges = if (shape == null) 0 else shape.numEdges
      edgeIdV = 0
      if (numEdges > 0) return
    }
  }
}

/** O(n) containment from a shape's reference point
  * (shapeutil.go:213-230).
  */
object ShapeUtil {
  /** A (point, contained) anchor for a dimension-2 shape that may contain
    * degeneracies (shapeutil.go:115-203): find an unbalanced vertex (one
    * with an unmatched incident edge) and decide its containment with
    * ContainsVertexQuery; sibling-pair-only shapes define the empty
    * region. Falls back to sorting edges against their reversals to find
    * an unmatched edge when the first vertex is balanced.
    */
  def referencePointForShape(shape: Shape): (Vec3, Boolean) = {
    if (shape.numEdges == 0)
      // A shape with no edges is full iff it has at least one chain;
      // the reduced Shape trait cannot express chains, so edge-free
      // means empty here (LaxPolygonShape overrides this case itself).
      return (EdgeCrossings.originPoint, false)
    referencePointAtVertex(shape, shape.edge(0)._1) match {
      case Some(r) => return r
      case None => ()
    }
    // First vertex balanced: find an unmatched edge by comparing the
    // sorted edge multiset with the sorted reversed-edge multiset.
    val n = shape.numEdges
    implicit val vecOrd: Ordering[(Vec3, Vec3)] =
      Ordering.by(e => (e._1.x, e._1.y, e._1.z, e._2.x, e._2.y, e._2.z))
    val edges = Array.tabulate(n)(shape.edge).sorted
    val rev = Array.tabulate(n) { e =>
      val (a, b) = shape.edge(e); (b, a)
    }.sorted
    var i = 0
    while (i < n) {
      if (vecOrd.lt(edges(i), rev(i))) {
        referencePointAtVertex(shape, edges(i)._1) match {
          case Some(r) => return r
          case None => ()
        }
      }
      if (vecOrd.lt(rev(i), edges(i))) {
        referencePointAtVertex(shape, rev(i)._1) match {
          case Some(r) => return r
          case None => ()
        }
      }
      i += 1
    }
    // All edges are matched sibling pairs: the region is empty.
    (EdgeCrossings.originPoint, false)
  }

  private def referencePointAtVertex(shape: Shape,
                                     vTest: Vec3): Option[(Vec3, Boolean)] = {
    val q = new ContainsVertexQuery(vTest)
    var e = 0
    while (e < shape.numEdges) {
      val (v0, v1) = shape.edge(e)
      if (v0 == vTest) q.addEdge(v1, 1)
      if (v1 == vTest) q.addEdge(v0, -1)
      e += 1
    }
    val sign = q.containsVertex()
    if (sign == 0) None else Some((vTest, sign > 0))
  }

  def containsBruteForce(shape: Shape, point: Vec3): Boolean = {
    if (shape.dimension != 2) return false
    val (refPoint, refContained) = shape.referencePoint
    if (refPoint == point) return refContained
    val crosser = new EdgeCrosser(refPoint, point)
    var inside = refContained
    var e = 0
    while (e < shape.numEdges) {
      val (v0, v1) = shape.edge(e)
      inside ^= crosser.edgeOrVertexCrossingTo(v0, v1)
      e += 1
    }
    inside
  }
}

/** The part of one shape intersecting one index cell: the ORIGINAL edge
  * ids crossing the (padded) cell, plus whether the cell center is inside
  * the shape (shapeindex.go:65-110).
  */
final class ClippedShape(val shapeId: Int, var containsCenter: Boolean,
                         val edges: Array[Int]) {
  def numEdges: Int = edges.length
  def containsEdge(id: Int): Boolean = edges.contains(id)
}

final class ShapeIndexCell(val shapes: Array[ClippedShape]) {
  def numEdges: Int = shapes.map(_.numEdges).sum
  def findByShapeId(id: Int): ClippedShape = {
    var i = 0
    while (i < shapes.length) {
      if (shapes(i).shapeId == id) return shapes(i)
      i += 1
    }
    null
  }
}

/** Cell relation of a target to the index (shapeindex.go:28-39). */
object CellRelation {
  final val Indexed = 0
  final val Subdivided = 1
  final val Disjoint = 2
}

/** The reference's ShapeIndex, batch-build path
  * (/root/reference/s2/shapeindex.go:560-1360): every shape edge is
  * clipped to the six cube faces (ClipToPaddedFace with cellPadding),
  * then recursively distributed over a PaddedCell subdivision that
  * splits while more than maxEdgesPerCell short edges land in a cell
  * (long edges — longer than the cell — do not count). The interior
  * tracker walks cell entry/center/exit vertices in Hilbert order,
  * maintaining the set of shapes containing the focus, which stamps
  * containsCenter on every emitted cell.
  *
  * Deviation from the reference: incremental add/remove after the first
  * build is not supported (the engine builds indexes once per immutable
  * shape set); the first-build path is ported faithfully.
  */
final class ShapeIndex(val maxEdgesPerCell: Int = 10) {
  import EdgeClipping._

  /** Total clip slop so queries need no re-padding
    * (shapeindex.go:41-51).
    */
  val CellPadding: Double = 2.0 * (FaceClipErrorUVCoord + EdgeClipErrorUVCoord)

  private val shapesBuf = scala.collection.mutable.ArrayBuffer[Shape]()
  private var fresh = false
  // Shapes indexed by previous update rounds have ids below this; ids at
  // or above it are pending additions (shapeindex.go pendingAdditionsPos).
  private var pendingAdditionsPos = 0
  private final class RemovedShape(val shapeId: Int, val hasInterior: Boolean,
                                   val containsTrackerOrigin: Boolean,
                                   val edges: Array[(Vec3, Vec3)])
  private val pendingRemovals =
    scala.collection.mutable.ArrayBuffer[RemovedShape]()
  // Live cell store in unsigned Hilbert order; `cells` is the snapshot
  // the (binary-search) iterator reads, refreshed after each update.
  private val cellTree = new java.util.TreeMap[java.lang.Long, ShapeIndexCell](
    new java.util.Comparator[java.lang.Long] {
      def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })
  private[core] var cells: Array[Long] = Array.empty

  /** Queue a shape for (lazy, batched) addition; applied on first query
    * (shapeindex.go:740-745).
    */
  def add(shape: Shape): Int = synchronized {
    shapesBuf += shape
    fresh = false
    shapesBuf.length - 1
  }

  /** Queue a shape for (lazy, batched) removal (shapeindex.go:748-781;
    * the reference documents this algorithm but leaves
    * removeShapeInternal an empty TODO and never applies it — here the
    * documented batch-update path is implemented in full). The removed
    * id stays vacant; shape(id) returns null for it.
    */
  def remove(shapeId: Int): Unit = synchronized {
    val s = shapesBuf(shapeId)
    if (s == null) return
    shapesBuf(shapeId) = null
    fresh = false
    // Removing a shape that was never indexed needs no update entry.
    if (shapeId >= pendingAdditionsPos) return
    pendingRemovals += new RemovedShape(shapeId, s.dimension == 2,
      ShapeUtil.containsBruteForce(s, STUV.faceUVToXYZ(0, -1, -1).normalize),
      Array.tabulate(s.numEdges)(s.edge))
  }

  /** Force pending updates to be applied now (shapeindex.go Build). */
  def build(): Unit = maybeBuild()

  /** Whether there are no pending updates (shapeindex.go IsFresh). */
  def isFresh: Boolean = fresh

  def numShapes: Int = shapesBuf.length
  /** The shape with the given id, or null if it was removed. */
  def shape(id: Int): Shape = shapesBuf(id)

  def cellFor(id: Long): ShapeIndexCell = cellTree.get(id)

  private def isShapeBeingRemoved(shapeId: Int): Boolean =
    shapeId < pendingAdditionsPos && shapesBuf(shapeId) == null

  /** Cell relation of target against the LIVE cell tree (used mid-update,
    * when the `cells` snapshot is stale): returns (relation, containing
    * cell id when Indexed).
    */
  private def locateCellIdLive(target: Long): (Int, Long) = {
    import java.lang.{Long => JL}
    val ceil = cellTree.ceilingKey(CellId.rangeMin(target))
    if (ceil != null) {
      val c = ceil.longValue()
      if (JL.compareUnsigned(c, target) >= 0 &&
        JL.compareUnsigned(CellId.rangeMin(c), target) <= 0)
        return (CellRelation.Indexed, c)
      if (JL.compareUnsigned(c, CellId.rangeMax(target)) <= 0)
        return (CellRelation.Subdivided, 0L)
    }
    val floor = cellTree.lowerKey(CellId.rangeMin(target))
    if (floor != null &&
      JL.compareUnsigned(CellId.rangeMax(floor.longValue()), target) >= 0)
      return (CellRelation.Indexed, floor.longValue())
    (CellRelation.Disjoint, 0L)
  }

  // --- build ---------------------------------------------------------

  private final class FaceEdge(val shapeId: Int, val edgeId: Int,
                               val maxLevel: Int, val hasInterior: Boolean,
                               val aX: Double, val aY: Double,
                               val bX: Double, val bY: Double,
                               val v0: Vec3, val v1: Vec3)

  private final class ClippedEdge(val fe: FaceEdge,
                                  val xLo: Double, val xHi: Double,
                                  val yLo: Double, val yHi: Double)

  /** First subdivision level where the average cell size is at most the
    * edge length (shapeindex.go:1529-1537).
    */
  private def maxLevelForEdge(v0: Vec3, v1: Vec3): Int =
    Metric.AvgEdge.minLevel((v0 - v1).norm * 1.0 /* cellSizeToLongEdgeRatio */)

  private final class Tracker {
    var isActive = false
    var a: Vec3 = Vec3.zero
    var b: Vec3 = STUV.faceUVToXYZ(0, -1, -1).normalize
    var nextCellId: Long =
      CellId.childBeginAtLevel(CellId.fromFace(0), CellId.MaxLevel)
    var crosser: EdgeCrosser = _
    var shapeIds: List[Int] = Nil
    drawTo(STUV.faceUVToXYZ(0, -1, -1).normalize)

    def focus: Vec3 = b
    def addShape(shapeId: Int, containsFocus: Boolean): Unit = {
      isActive = true
      if (containsFocus) toggleShape(shapeId)
    }
    def moveTo(p: Vec3): Unit = b = p
    def drawTo(p: Vec3): Unit = { a = b; b = p; crosser = new EdgeCrosser(a, b) }
    def testEdge(shapeId: Int, v0: Vec3, v1: Vec3): Unit =
      if (crosser.edgeOrVertexCrossingTo(v0, v1)) toggleShape(shapeId)
    def setNextCellId(id: Long): Unit = nextCellId = CellId.rangeMin(id)
    def atCellId(id: Long): Boolean = CellId.rangeMin(id) == nextCellId
    def toggleShape(shapeId: Int): Unit =
      shapeIds = if (shapeIds.contains(shapeId)) shapeIds.filterNot(_ == shapeId)
        else (shapeId :: shapeIds).sorted

    // Ids below the limit (previously-indexed shapes absorbed from an
    // existing cell) are parked while a subtree is reprocessed, and
    // restored afterwards (shapeindex.go tracker:523-537).
    private var savedIds: List[Int] = Nil
    def saveAndClearStateBefore(limit: Int): Unit = {
      savedIds = shapeIds.filter(_ < limit)
      shapeIds = shapeIds.filter(_ >= limit)
    }
    def restoreStateBefore(limit: Int): Unit = {
      shapeIds = savedIds ++ shapeIds.filter(_ >= limit)
      savedIds = Nil
    }
  }

  /** Apply all pending additions and removals as one batch
    * (shapeindex.go applyUpdatesInternal). The first update is the plain
    * batch build; later updates merge with the existing cells by
    * absorbing any index cell the recursion encounters.
    */
  private[core] def maybeBuild(): Unit = synchronized {
    if (fresh) return
    val firstUpdate = pendingAdditionsPos == 0
    val t = new Tracker
    val allEdges = Array.fill(6)(scala.collection.mutable.ArrayBuffer[FaceEdge]())
    // Removals first (their ids precede every pending addition, keeping
    // each face's edge list sorted by shape id for the cell merge).
    for (r <- pendingRemovals.sortBy(_.shapeId)) {
      if (r.hasInterior) t.addShape(r.shapeId, r.containsTrackerOrigin)
      var e = 0
      while (e < r.edges.length) {
        val (v0, v1) = r.edges(e)
        addFaceEdge(r.shapeId, e, r.hasInterior, v0, v1, allEdges)
        e += 1
      }
    }
    for (shapeId <- pendingAdditionsPos until shapesBuf.length) {
      val s = shapesBuf(shapeId)
      if (s != null) {
        val hasInterior = s.dimension == 2
        if (hasInterior)
          t.addShape(shapeId, ShapeUtil.containsBruteForce(s, t.focus))
        var e = 0
        while (e < s.numEdges) {
          val (v0, v1) = s.edge(e)
          addFaceEdge(shapeId, e, hasInterior, v0, v1, allEdges)
          e += 1
        }
      }
    }
    for (face <- 0 until 6)
      updateFaceEdges(face, allEdges(face).toArray, t, firstUpdate)
    pendingRemovals.clear()
    pendingAdditionsPos = shapesBuf.length
    // Snapshot the live tree in unsigned Hilbert order for the iterator.
    val snap = new Array[Long](cellTree.size())
    val it = cellTree.keySet().iterator()
    var i = 0
    while (it.hasNext) { snap(i) = it.next().longValue(); i += 1 }
    cells = snap
    fresh = true
  }

  private def addFaceEdge(shapeId: Int, edgeId: Int, hasInterior: Boolean,
                          v0: Vec3, v1: Vec3,
                          allEdges: Array[scala.collection.mutable.ArrayBuffer[FaceEdge]]): Unit = {
    val maxLevel = maxLevelForEdge(v0, v1)
    val aFace = STUV.face(v0.x, v0.y, v0.z)
    if (aFace == STUV.face(v1.x, v1.y, v1.z)) {
      val ax = STUV.validFaceXYZtoU(aFace, v0.x, v0.y, v0.z)
      val ay = STUV.validFaceXYZtoV(aFace, v0.x, v0.y, v0.z)
      val bx = STUV.validFaceXYZtoU(aFace, v1.x, v1.y, v1.z)
      val by = STUV.validFaceXYZtoV(aFace, v1.x, v1.y, v1.z)
      val maxUV = 1 - CellPadding
      if (math.abs(ax) <= maxUV && math.abs(ay) <= maxUV &&
        math.abs(bx) <= maxUV && math.abs(by) <= maxUV) {
        allEdges(aFace) += new FaceEdge(shapeId, edgeId, maxLevel, hasInterior,
          ax, ay, bx, by, v0, v1)
        return
      }
    }
    for (face <- 0 until 6) {
      clipToPaddedFace(v0, v1, face, CellPadding).foreach {
        case (ax, ay, bx, by) =>
          allEdges(face) += new FaceEdge(shapeId, edgeId, maxLevel, hasInterior,
            ax, ay, bx, by, v0, v1)
      }
    }
  }

  private def updateFaceEdges(face: Int, faceEdges: Array[FaceEdge],
                              t: Tracker, disjointFromIndex: Boolean): Unit = {
    if (faceEdges.isEmpty && t.shapeIds.isEmpty) return
    var xLo = Double.MaxValue; var xHi = -Double.MaxValue
    var yLo = Double.MaxValue; var yHi = -Double.MaxValue
    val clippedEdges = faceEdges.map { fe =>
      val e = new ClippedEdge(fe, math.min(fe.aX, fe.bX), math.max(fe.aX, fe.bX),
        math.min(fe.aY, fe.bY), math.max(fe.aY, fe.bY))
      xLo = math.min(xLo, e.xLo); xHi = math.max(xHi, e.xHi)
      yLo = math.min(yLo, e.yLo); yHi = math.max(yHi, e.yHi)
      e
    }
    val faceId = CellId.fromFace(face)
    var pcell = PaddedCell.fromCellId(faceId, CellPadding)
    if (faceEdges.nonEmpty) {
      var shrunkId = pcell.shrinkToFit(xLo, xHi, yLo, yHi)
      // Never shrink below an existing index cell: the new edges must be
      // combined with that cell's contents (shapeindex.go shrinkToFit).
      if (!disjointFromIndex && shrunkId != faceId) {
        val (rel, cid) = locateCellIdLive(shrunkId)
        if (rel == CellRelation.Indexed) shrunkId = cid
      }
      if (shrunkId != faceId) {
        skipCellRange(CellId.rangeMin(faceId), CellId.rangeMin(shrunkId),
          t, disjointFromIndex)
        pcell = PaddedCell.fromCellId(shrunkId, CellPadding)
        updateEdges(pcell, clippedEdges.toList, t, disjointFromIndex)
        skipCellRange(CellId.next(CellId.rangeMax(shrunkId)),
          CellId.next(CellId.rangeMax(faceId)), t, disjointFromIndex)
        return
      }
    }
    updateEdges(pcell, clippedEdges.toList, t, disjointFromIndex)
  }

  private def skipCellRange(begin: Long, end: Long, t: Tracker,
                            disjointFromIndex: Boolean): Unit = {
    if (t.shapeIds.isEmpty) return
    CellUnion.fromRange(begin, end).ids.foreach { cell =>
      updateEdges(PaddedCell.fromCellId(cell, CellPadding), Nil, t,
        disjointFromIndex)
    }
  }

  private def updateEdges(pcell: PaddedCell, edges0: List[ClippedEdge],
                          t: Tracker, disjoint0: Boolean): Unit = {
    // Incremental merge (shapeindex.go:1005-1075): subdivide as usual
    // until an existing index cell is reached, absorb its contents into
    // the edge set (erasing shapes being removed), continue below it as
    // if building fresh, and restore the tracker's parked state when the
    // recursion returns to the absorbed cell.
    var edges = edges0
    var disjoint = disjoint0
    var absorbed = false
    if (!disjoint) {
      locateCellIdLive(pcell.id) match {
        case (CellRelation.Disjoint, _) => disjoint = true
        case (CellRelation.Indexed, cid) =>
          edges = absorbIndexCell(pcell, cid, edges, t)
          absorbed = true
          disjoint = true
        case _ => () // Subdivided: existing cells below; keep descending
      }
    }
    if (!disjoint || !makeIndexCell(pcell, edges, t)) {
      val (mULo, mUHi, mVLo, mVHi) = pcell.middle
      val child00 = scala.collection.mutable.ListBuffer[ClippedEdge]()
      val child01 = scala.collection.mutable.ListBuffer[ClippedEdge]()
      val child10 = scala.collection.mutable.ListBuffer[ClippedEdge]()
      val child11 = scala.collection.mutable.ListBuffer[ClippedEdge]()

      def addV(e: ClippedEdge, lowBuf: scala.collection.mutable.ListBuffer[ClippedEdge],
               hiBuf: scala.collection.mutable.ListBuffer[ClippedEdge]): Unit = {
        val (a, b) = clipVAxis(e, mVLo, mVHi)
        if (a != null) lowBuf += a
        if (b != null) hiBuf += b
      }

      edges.foreach { edge =>
        if (edge.xHi <= mULo) addV(edge, child00, child01)
        else if (edge.xLo >= mUHi) addV(edge, child10, child11)
        else if (edge.yHi <= mVLo) {
          val a = clipUBound(edge, 1, mUHi); if (a != null) child00 += a
          val b = clipUBound(edge, 0, mULo); if (b != null) child10 += b
        } else if (edge.yLo >= mVHi) {
          val a = clipUBound(edge, 1, mUHi); if (a != null) child01 += a
          val b = clipUBound(edge, 0, mULo); if (b != null) child11 += b
        } else {
          val left = clipUBound(edge, 1, mUHi)
          addV(left, child00, child01)
          val right = clipUBound(edge, 0, mULo)
          addV(right, child10, child11)
        }
      }

      def bufFor(i: Int, j: Int) = (i, j) match {
        case (0, 0) => child00
        case (0, 1) => child01
        case (1, 0) => child10
        case _ => child11
      }
      for (pos <- 0 until 4) {
        val (i, j) = pcell.childIJ(pos)
        val buf = bufFor(i, j)
        // Children with no changed edges and no tracked interior keep
        // their existing subtrees untouched — that skip is what makes
        // the update incremental rather than a rebuild.
        if (buf.nonEmpty || t.shapeIds.nonEmpty)
          updateEdges(pcell.childAt(i, j), buf.toList, t, disjoint)
      }
    }
    if (absorbed) t.restoreStateBefore(pendingAdditionsPos)
  }

  /** Transfer an existing index cell's contents into the edge set being
    * updated, delete the cell, and park the tracker state of its
    * (previously indexed) shapes until the subtree is done
    * (shapeindex.go:1366-1480; the reference's version swaps a local
    * slice header, so its result never reaches the caller — returning
    * the merged edge list here is the corrected form).
    */
  private def absorbIndexCell(p: PaddedCell, absorbId: Long,
                              edges: List[ClippedEdge],
                              t: Tracker): List[ClippedEdge] = {
    require(absorbId == p.id,
      "absorb invariant: located cell must equal the visited cell")
    // Advance the removed shapes' interior state to this cell's exit
    // vertex first (their edges vanish below, but the walk continues).
    if (t.isActive && edges.nonEmpty &&
      isShapeBeingRemoved(edges.head.fe.shapeId)) {
      if (!t.atCellId(p.id)) t.moveTo(p.entryVertex)
      t.drawTo(p.exitVertex)
      t.setNextCellId(CellId.next(p.id))
      edges.iterator.takeWhile(e => isShapeBeingRemoved(e.fe.shapeId))
        .foreach { e =>
          if (e.fe.hasInterior) t.testEdge(e.fe.shapeId, e.fe.v0, e.fe.v1)
        }
    }
    t.saveAndClearStateBefore(pendingAdditionsPos)

    val face = CellId.face(p.id)
    val (pULo, pUHi, pVLo, pVHi) = p.bound
    val newEdges = scala.collection.mutable.ListBuffer[ClippedEdge]()
    var trackerMoved = false
    val cell = cellTree.get(absorbId)
    for (clipped <- cell.shapes) {
      val shapeId = clipped.shapeId
      val shape = shapesBuf(shapeId)
      if (shape != null) { // null = shape being removed: erase its edges
        val hasInterior = shape.dimension == 2
        if (hasInterior) {
          t.addShape(shapeId, clipped.containsCenter)
          // The cell may be pure interior (no edges); only reposition the
          // tracker when there is an edge to test against.
          if (!trackerMoved && clipped.numEdges > 0) {
            t.moveTo(p.center)
            t.drawTo(p.entryVertex)
            t.setNextCellId(p.id)
            trackerMoved = true
          }
        }
        for (edgeId <- clipped.edges) {
          val (v0, v1) = shape.edge(edgeId)
          if (hasInterior) t.testEdge(shapeId, v0, v1)
          clipToPaddedFace(v0, v1, face, CellPadding) match {
            case Some((ax, ay, bx, by)) =>
              val fe = new FaceEdge(shapeId, edgeId, maxLevelForEdge(v0, v1),
                hasInterior, ax, ay, bx, by, v0, v1)
              // TIGHT bound of the edge portion inside this cell's padded
              // rect (Go clippedEdgeBound): interpolated per axis, not a
              // bbox clamp — a clamp is looser for diagonal edges and
              // leaks edges into cells they do not intersect.
              clipEdgeBound(ax, ay, bx, by, (pULo, pUHi), (pVLo, pVHi)) match {
                case Some(((xLo, xHi), (yLo, yHi))) =>
                  newEdges += new ClippedEdge(fe, xLo, xHi, yLo, yHi)
                case None =>
                  throw new IllegalStateException(
                    "ShapeIndex invariant: absorbed edge must intersect its cell")
              }
            case None =>
              throw new IllegalStateException(
                "ShapeIndex invariant: indexed edge must clip to its face")
          }
        }
      }
    }
    // Keep the incoming edges that are not being removed (removed ids
    // sort first, so the merged list stays sorted by shape id).
    newEdges ++= edges.dropWhile(e => isShapeBeingRemoved(e.fe.shapeId))
    cellTree.remove(absorbId)
    newEdges.toList
  }

  private def makeIndexCell(p: PaddedCell, edges: List[ClippedEdge],
                            t: Tracker): Boolean = {
    if (edges.isEmpty && t.shapeIds.isEmpty) return true
    // count edges that have not reached their max level
    var count = 0
    var tooMany = false
    edges.foreach { ce =>
      if (p.level < ce.fe.maxLevel) {
        count += 1
        if (count > maxEdgesPerCell) tooMany = true
      }
    }
    if (tooMany) return false

    if (t.isActive && edges.nonEmpty) {
      if (!t.atCellId(p.id)) t.moveTo(p.entryVertex)
      t.drawTo(p.center)
      edges.foreach(e =>
        if (e.fe.hasInterior) t.testEdge(e.fe.shapeId, e.fe.v0, e.fe.v1))
    }

    // merge edge shapes with center-containing shapes (both id-sorted)
    val cShapeIds = t.shapeIds
    val edgeArr = edges.toArray
    val clippedShapes = scala.collection.mutable.ArrayBuffer[ClippedShape]()
    var eNext = 0
    var cRest = cShapeIds
    while (eNext < edgeArr.length || cRest.nonEmpty) {
      val eShapeId = if (eNext < edgeArr.length) edgeArr(eNext).fe.shapeId
        else Int.MaxValue
      val cShapeId = cRest.headOption.getOrElse(Int.MaxValue)
      if (cShapeId < eShapeId) {
        val cs = new ClippedShape(cShapeId, true, Array.empty)
        clippedShapes += cs
        cRest = cRest.tail
      } else {
        val eBegin = eNext
        while (eNext < edgeArr.length && edgeArr(eNext).fe.shapeId == eShapeId)
          eNext += 1
        val cs = new ClippedShape(eShapeId, cShapeId == eShapeId,
          (eBegin until eNext).map(edgeArr(_).fe.edgeId).toArray)
        clippedShapes += cs
        if (cShapeId == eShapeId) cRest = cRest.tail
      }
    }
    cellTree.put(p.id, new ShapeIndexCell(clippedShapes.toArray))

    if (t.isActive && edges.nonEmpty) {
      t.drawTo(p.exitVertex)
      edges.foreach(e =>
        if (e.fe.hasInterior) t.testEdge(e.fe.shapeId, e.fe.v0, e.fe.v1))
      t.setNextCellId(CellId.next(p.id))
    }
    true
  }

  private def updateBound(edge: ClippedEdge, uEnd: Int, u: Double,
                          vEnd: Int, v: Double): ClippedEdge = {
    val (xLo, xHi) = if (uEnd == 0) (u, edge.xHi) else (edge.xLo, u)
    val (yLo, yHi) = if (vEnd == 0) (v, edge.yHi) else (edge.yLo, v)
    new ClippedEdge(edge.fe, xLo, xHi, yLo, yHi)
  }

  private def clipUBound(edge: ClippedEdge, uEnd: Int, u: Double): ClippedEdge = {
    if (uEnd == 0) { if (edge.xLo >= u) return edge }
    else { if (edge.xHi <= u) return edge }
    val e = edge.fe
    val vRaw = interpolateDouble(u, e.aX, e.bX, e.aY, e.bY)
    val v = math.max(edge.yLo, math.min(edge.yHi, vRaw))
    val positiveSlope = (e.aX > e.bX) == (e.aY > e.bY)
    val vEnd = if ((uEnd == 1) == positiveSlope) 1 else 0
    updateBound(edge, uEnd, u, vEnd, v)
  }

  private def clipVBound(edge: ClippedEdge, vEnd: Int, v: Double): ClippedEdge = {
    if (vEnd == 0) { if (edge.yLo >= v) return edge }
    else { if (edge.yHi <= v) return edge }
    val e = edge.fe
    val uRaw = interpolateDouble(v, e.aY, e.bY, e.aX, e.bX)
    val u = math.max(edge.xLo, math.min(edge.xHi, uRaw))
    val positiveSlope = (e.aX > e.bX) == (e.aY > e.bY)
    val uEnd = if ((vEnd == 1) == positiveSlope) 1 else 0
    updateBound(edge, uEnd, u, vEnd, v)
  }

  private def clipVAxis(edge: ClippedEdge, mVLo: Double,
                        mVHi: Double): (ClippedEdge, ClippedEdge) = {
    if (edge.yHi <= mVLo) (edge, null)
    else if (edge.yLo >= mVHi) (null, edge)
    else (clipVBound(edge, 1, mVHi), clipVBound(edge, 0, mVLo))
  }

  // --- iterator ------------------------------------------------------

  def iterator(): ShapeIndexIterator = {
    maybeBuild()
    new ShapeIndexIterator(this)
  }
}

/** Sorted-cell iterator with seek/locate (shapeindex.go:200-371). */
final class ShapeIndexIterator(index: ShapeIndex) {
  import java.lang.{Long => JLong}
  private var position = 0

  def done: Boolean = position >= index.cells.length
  def cellId: Long = if (done) -1L /* sentinel, unsigned max */ else index.cells(position)
  def indexCell: ShapeIndexCell = index.cellFor(cellId)
  def center: Vec3 = CellId.toPoint(cellId)
  def begin(): Unit = position = 0
  def next(): Unit = position += 1
  def prev(): Boolean = {
    if (position == 0) return false
    position -= 1
    true
  }

  def seek(target: Long): Unit = {
    var lo = 0
    var hi = index.cells.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (JLong.compareUnsigned(index.cells(mid), target) < 0) lo = mid + 1
      else hi = mid
    }
    position = lo
  }

  /** Position at the cell containing p (shapeindex.go:126-145). */
  def locatePoint(p: Vec3): Boolean = {
    val target = CellId.fromPoint(p.x, p.y, p.z)
    seek(target)
    if (!done && JLong.compareUnsigned(CellId.rangeMin(cellId), target) <= 0)
      return true
    if (prev() && JLong.compareUnsigned(CellId.rangeMax(cellId), target) >= 0)
      return true
    false
  }

  /** Indexed / Subdivided / Disjoint relation (shapeindex.go:347-371). */
  def locateCellId(target: Long): Int = {
    seek(CellId.rangeMin(target))
    if (!done) {
      if (JLong.compareUnsigned(cellId, target) >= 0 &&
        JLong.compareUnsigned(CellId.rangeMin(cellId), target) <= 0)
        return CellRelation.Indexed
      if (JLong.compareUnsigned(cellId, CellId.rangeMax(target)) <= 0)
        return CellRelation.Subdivided
    }
    if (prev() && JLong.compareUnsigned(CellId.rangeMax(cellId), target) >= 0)
      return CellRelation.Indexed
    CellRelation.Disjoint
  }
}

/** Adapts a ShapeIndex to the Region interface so RegionCoverer can
  * cover whole indexes (/root/reference/s2/shapeindex_region.go:15-133).
  * The reference implements CellUnionBound/CapBound/RectBound and leaves
  * the cell predicates as TODOs; here the cell callbacks are implemented
  * conservatively (containsCell = false, intersectsCell = index-cell
  * relation != Disjoint), which keeps coverings valid covers.
  */
final class ShapeIndexRegion(index: ShapeIndex) extends S2Region {
  private def iter = index.iterator()

  /** <= 4 cells within one face, up to 6 across faces
    * (shapeindex_region.go:44-106).
    */
  def cellUnionBound: Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val it = iter
    if (index.cells.isEmpty) return Array.empty
    val lastIndexId = index.cells.last
    it.begin()
    if (it.cellId != lastIndexId) {
      // span at most 4-6 cells at one level above the common ancestor
      val common = CellId.commonAncestorLevel(it.cellId, lastIndexId)
      val level = (if (common < 0) -1 else common) + 1
      val lastId = CellId.parent(lastIndexId, level)
      var id = CellId.parent(it.cellId, level)
      var guard = 0
      while (id != lastId && guard < 8) {
        if (java.lang.Long.compareUnsigned(CellId.rangeMax(id), it.cellId) >= 0) {
          val first = it.cellId
          it.seek(CellId.next(CellId.rangeMax(id)))
          it.prev()
          coverRange(first, it.cellId, out)
          it.next()
        }
        id = CellId.next(id)
        guard += 1
      }
    }
    coverRange(it.cellId, lastIndexId, out)
    out.toArray
  }

  private def coverRange(first: Long, last: Long,
                         out: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
    if (first == last) { out += first; return }
    val level = CellId.commonAncestorLevel(first, last)
    if (level < 0) { out += 0L; return }
    out += CellId.parent(first, level)
  }

  def capBound: Cap = {
    val ids = cellUnionBound.sorted(Ordering.fromLessThan[Long](
      (a, b) => java.lang.Long.compareUnsigned(a, b) < 0))
    CellUnion.fromNormalized(ids).capBound
  }

  def rectBound: SphereRect = {
    var r = SphereRect.empty
    cellUnionBound.foreach(id => r = r.union(Cell.fromId(id).rectBound))
    r
  }

  def containsCell(cell: Cell): Boolean = false // conservative (ref TODO)

  def intersectsCell(cell: Cell): Boolean =
    iter.locateCellId(cell.id) != CellRelation.Disjoint

  def containsPoint(p: Vec3): Boolean =
    new ContainsPointQuery(index, VertexModel.SemiOpen).contains(p)
}

/** Multi-shape PIP with Open/SemiOpen/Closed boundary models
  * (/root/reference/s2/contains_point_query.go:17-186).
  */
object VertexModel {
  final val Open = 0
  final val SemiOpen = 1
  final val Closed = 2
}

final class ContainsPointQuery(index: ShapeIndex,
                               model: Int = VertexModel.SemiOpen) {
  private val iter = index.iterator()

  def contains(p: Vec3): Boolean = {
    if (!iter.locatePoint(p)) return false
    val cell = iter.indexCell
    cell.shapes.exists(clipped => shapeContains(clipped, iter.center, p))
  }

  def shapeContains(shapeId: Int, p: Vec3): Boolean = {
    if (!iter.locatePoint(p)) return false
    val clipped = iter.indexCell.findByShapeId(shapeId)
    if (clipped == null) return false
    shapeContains(clipped, iter.center, p)
  }

  /** All shape ids containing p. */
  def containingShapes(p: Vec3): Seq[Int] = {
    if (!iter.locatePoint(p)) return Seq.empty
    val cell = iter.indexCell
    cell.shapes.filter(c => shapeContains(c, iter.center, p)).map(_.shapeId).toSeq
  }

  private def shapeContains(clipped: ClippedShape, center: Vec3, p: Vec3): Boolean = {
    var inside = clipped.containsCenter
    if (clipped.numEdges <= 0) return inside
    val shape = index.shape(clipped.shapeId)
    if (shape.dimension != 2) {
      if (model != VertexModel.Closed) return false
      return clipped.edges.exists { e =>
        val (v0, v1) = shape.edge(e)
        v0 == p || v1 == p
      }
    }
    val crosser = new EdgeCrosser(center, p)
    for (e <- clipped.edges) {
      val (v0, v1) = shape.edge(e)
      var sign = crosser.crossingSignTo(v0, v1)
      if (sign != EdgeCrossings.DoNotCross) {
        if (sign == EdgeCrossings.MaybeCross) {
          if (model != VertexModel.SemiOpen && (v0 == p || v1 == p))
            return model == VertexModel.Closed
          sign = if (EdgeCrossings.vertexCrossing(center, p, v0, v1))
            EdgeCrossings.Cross else EdgeCrossings.DoNotCross
        }
        inside = inside != (sign == EdgeCrossings.Cross)
      }
    }
    inside
  }
}
