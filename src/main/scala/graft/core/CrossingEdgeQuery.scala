package graft.core

/** Finds edges of indexed shapes crossed by a query edge AB via
  * recursive descent of the index cells the edge passes through
  * (/root/reference/s2/crossing_edge_query.go:15-420).
  */
object CrossingType {
  final val Interior = 0
  final val All = 1
}

final class CrossingEdgeQuery(index: ShapeIndex) {
  import EdgeClipping._

  private val iter = index.iterator()
  private var aX = 0.0
  private var aY = 0.0
  private var bX = 0.0
  private var bY = 0.0
  private var cells = scala.collection.mutable.ArrayBuffer[ShapeIndexCell]()

  /** Edge ids of `shapeId` crossing AB; Interior = proper crossings only,
    * All = shared vertices included (crossing_edge_query.go:51-78).
    */
  def crossings(a: Vec3, b: Vec3, shapeId: Int, crossType: Int): Seq[Int] = {
    val shape = index.shape(shapeId)
    val cand = candidates(a, b, shapeId)
    if (cand.isEmpty) return Nil
    val crosser = new EdgeCrosser(a, b)
    cand.filter { e =>
      val (v0, v1) = shape.edge(e)
      val sign = crosser.crossingSignTo(v0, v1)
      if (crossType == CrossingType.All)
        sign == EdgeCrossings.MaybeCross || sign == EdgeCrossings.Cross
      else sign == EdgeCrossings.Cross
    }
  }

  /** All crossings as (shapeId -> edge ids) (crossing_edge_query.go:85-117). */
  def crossingsEdgeMap(a: Vec3, b: Vec3, crossType: Int): Map[Int, Seq[Int]] = {
    val cand = candidatesEdgeMap(a, b)
    if (cand.isEmpty) return Map.empty
    val crosser = new EdgeCrosser(a, b)
    cand.flatMap { case (shapeId, edges) =>
      val shape = index.shape(shapeId)
      val hits = edges.filter { e =>
        val (v0, v1) = shape.edge(e)
        val sign = crosser.crossingSignTo(v0, v1)
        if (crossType == CrossingType.All)
          sign == EdgeCrossings.MaybeCross || sign == EdgeCrossings.Cross
        else sign == EdgeCrossings.Cross
      }
      if (hits.isEmpty) None else Some(shapeId -> hits)
    }
  }

  /** Superset of the shape's edges intersecting AB
    * (crossing_edge_query.go:120-165): brute force below 27 edges, else
    * union of the clipped edge lists of the index cells AB intersects.
    */
  def candidates(a: Vec3, b: Vec3, shapeId: Int): Seq[Int] = {
    val shape = index.shape(shapeId)
    val maxBruteForceEdges = 27
    if (shape.numEdges <= maxBruteForceEdges)
      return 0 until shape.numEdges
    getCellsForEdge(a, b)
    if (cells.isEmpty) return Nil
    val out = scala.collection.mutable.SortedSet[Int]()
    cells.foreach { cell =>
      val clipped = cell.findByShapeId(shapeId)
      if (clipped != null) out ++= clipped.edges
    }
    out.toSeq
  }

  private def candidatesEdgeMap(a: Vec3, b: Vec3): Map[Int, Seq[Int]] = {
    if (index.numShapes == 1)
      return Map(0 -> candidates(a, b, 0))
    getCellsForEdge(a, b)
    if (cells.isEmpty) return Map.empty
    val m = scala.collection.mutable.HashMap[Int, scala.collection.mutable.SortedSet[Int]]()
    cells.foreach { cell =>
      cell.shapes.foreach { clipped =>
        val set = m.getOrElseUpdate(clipped.shapeId,
          scala.collection.mutable.SortedSet[Int]())
        set ++= clipped.edges
      }
    }
    m.map { case (k, v) => k -> v.toSeq }.toMap
  }

  /** Index cells within `root` possibly containing edges crossing AB
    * (loopCrosser's accelerator, crossing_edge_query.go:234-250).
    */
  def getCells(a: Vec3, b: Vec3, root: PaddedCell): Seq[ShapeIndexCell] = {
    cells = scala.collection.mutable.ArrayBuffer[ShapeIndexCell]()
    clipToFace(a, b, CellId.face(root.id)).foreach { case (au, av, bu, bv) =>
      aX = au; aY = av; bX = bu; bY = bv
      val exLo = math.min(aX, bX); val exHi = math.max(aX, bX)
      val eyLo = math.min(aY, bY); val eyHi = math.max(aY, bY)
      val (ruLo, ruHi, rvLo, rvHi) = root.bound
      if (exLo <= ruHi && ruLo <= exHi && eyLo <= rvHi && rvLo <= eyHi)
        computeCellsIntersected(root, exLo, exHi, eyLo, eyHi)
    }
    cells.toSeq
  }

  private def getCellsForEdge(a: Vec3, b: Vec3): Unit = {
    cells = scala.collection.mutable.ArrayBuffer[ShapeIndexCell]()
    faceSegments(a, b).foreach { seg =>
      aX = seg.aU; aY = seg.aV; bX = seg.bU; bY = seg.bV
      val exLo = math.min(aX, bX); val exHi = math.max(aX, bX)
      val eyLo = math.min(aY, bY); val eyHi = math.max(aY, bY)
      var pcell = PaddedCell.fromCellId(CellId.fromFace(seg.face), 0)
      val edgeRoot = pcell.shrinkToFit(exLo, exHi, eyLo, eyHi)
      iter.locateCellId(edgeRoot) match {
        case CellRelation.Indexed =>
          cells += iter.indexCell
        case CellRelation.Subdivided =>
          if (!CellId.isFace(edgeRoot))
            pcell = PaddedCell.fromCellId(edgeRoot, 0)
          computeCellsIntersected(pcell, exLo, exHi, eyLo, eyHi)
        case _ => ()
      }
    }
  }

  private def computeCellsIntersected(pcell: PaddedCell, xLo: Double, xHi: Double,
                                      yLo: Double, yHi: Double): Unit = {
    iter.seek(CellId.rangeMin(pcell.id))
    if (iter.done || java.lang.Long.compareUnsigned(iter.cellId,
      CellId.rangeMax(pcell.id)) > 0) return
    if (iter.cellId == pcell.id) {
      cells += iter.indexCell
      return
    }
    val (centerU, _, centerV, _) = pcell.middle // padding 0: lo == hi == center
    if (xHi < centerU) {
      clipVAxis(xLo, xHi, yLo, yHi, centerV, 0, pcell)
    } else if (xLo >= centerU) {
      clipVAxis(xLo, xHi, yLo, yHi, centerV, 1, pcell)
    } else {
      val (b0, b1) = splitUBound(xLo, xHi, yLo, yHi, centerU)
      if (yHi < centerV) {
        computeCellsIntersected(pcell.childAt(0, 0), b0._1, b0._2, b0._3, b0._4)
        computeCellsIntersected(pcell.childAt(1, 0), b1._1, b1._2, b1._3, b1._4)
      } else if (yLo >= centerV) {
        computeCellsIntersected(pcell.childAt(0, 1), b0._1, b0._2, b0._3, b0._4)
        computeCellsIntersected(pcell.childAt(1, 1), b1._1, b1._2, b1._3, b1._4)
      } else {
        clipVAxis(b0._1, b0._2, b0._3, b0._4, centerV, 0, pcell)
        clipVAxis(b1._1, b1._2, b1._3, b1._4, centerV, 1, pcell)
      }
    }
  }

  private def clipVAxis(xLo: Double, xHi: Double, yLo: Double, yHi: Double,
                        center: Double, i: Int, pcell: PaddedCell): Unit = {
    if (yHi < center) {
      computeCellsIntersected(pcell.childAt(i, 0), xLo, xHi, yLo, yHi)
    } else if (yLo >= center) {
      computeCellsIntersected(pcell.childAt(i, 1), xLo, xHi, yLo, yHi)
    } else {
      val (b0, b1) = splitVBound(xLo, xHi, yLo, yHi, center)
      computeCellsIntersected(pcell.childAt(i, 0), b0._1, b0._2, b0._3, b0._4)
      computeCellsIntersected(pcell.childAt(i, 1), b1._1, b1._2, b1._3, b1._4)
    }
  }

  private type B = (Double, Double, Double, Double)

  private def splitUBound(xLo: Double, xHi: Double, yLo: Double, yHi: Double,
                          u: Double): (B, B) = {
    val v = math.max(yLo, math.min(yHi, interpolateDouble(u, aX, bX, aY, bY)))
    val diag = if ((aX > bX) != (aY > bY)) 1 else 0
    splitBound(xLo, xHi, yLo, yHi, 0, diag, u, v)
  }

  private def splitVBound(xLo: Double, xHi: Double, yLo: Double, yHi: Double,
                          v: Double): (B, B) = {
    val u = math.max(xLo, math.min(xHi, interpolateDouble(v, aY, bY, aX, bX)))
    val diag = if ((aX > bX) != (aY > bY)) 1 else 0
    splitBound(xLo, xHi, yLo, yHi, diag, 0, u, v)
  }

  private def splitBound(xLo: Double, xHi: Double, yLo: Double, yHi: Double,
                         uEnd: Int, vEnd: Int, u: Double, v: Double): (B, B) = {
    val (c0x, c1x) =
      if (uEnd == 1) ((u, xHi), (xLo, u)) else ((xLo, u), (u, xHi))
    val (c0y, c1y) =
      if (vEnd == 1) ((v, yHi), (yLo, v)) else ((yLo, v), (v, yHi))
    ((c0x._1, c0x._2, c0y._1, c0y._2), (c1x._1, c1x._2, c1y._1, c1y._2))
  }
}
