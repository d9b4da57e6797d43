package graft.core

/** Closest-edge queries over a ShapeIndex
  * (/root/reference/s2/edge_query.go:177-763 + distance targets from
  * min_distance_targets.go): find the k closest edges to a point, edge,
  * or cell target, optionally bounded by a distance limit and including
  * interior hits (distance 0 for shapes containing the target).
  *
  * Distance currency is squared chord length (monotone in angle,
  * s1/chordangle.go:107). Traversal deviation from the reference: the
  * queue is seeded with the index cells directly (exact per-cell lower
  * bounds from the Cell distance kernels) instead of descending from a
  * 6-cell covering; the best-first order and results are identical, only
  * the seeding cost differs.
  */
object ClosestEdgeQuery {

  /** What is being measured against (min_distance_targets.go). */
  sealed trait DistanceTarget {
    /** Possibly-improved min distance from the target to edge (v0,v1). */
    def updateMinDistance(v0: Vec3, v1: Vec3, minDist: Double): (Double, Boolean)
    /** Lower bound on the distance from the target to any point of cell. */
    def distanceToCell(cell: Cell): Double
    /** A point of the target for interior containment tests. */
    def samplePoint: Vec3
    /** One point per connected component, for interior tests on
      * multi-component targets (min_distance_targets.go:305-345).
      */
    def samplePoints: Seq[Vec3] = Seq(samplePoint)
  }

  final case class PointTarget(p: Vec3) extends DistanceTarget {
    def updateMinDistance(v0: Vec3, v1: Vec3, minDist: Double): (Double, Boolean) =
      EdgeDistances.updateMinDistance(p, v0, v1, minDist)
    def distanceToCell(cell: Cell): Double = cell.distance(p)
    def samplePoint: Vec3 = p
  }

  final case class EdgeTarget(a: Vec3, b: Vec3) extends DistanceTarget {
    def updateMinDistance(v0: Vec3, v1: Vec3, minDist: Double): (Double, Boolean) = {
      val d = EdgeDistances.edgePairMinDistance(a, b, v0, v1)
      if (d < minDist) (d, true) else (minDist, false)
    }
    def distanceToCell(cell: Cell): Double = cell.distanceToEdge(a, b)
    def samplePoint: Vec3 = a
  }

  final case class CellTarget(target: Cell) extends DistanceTarget {
    def updateMinDistance(v0: Vec3, v1: Vec3, minDist: Double): (Double, Boolean) = {
      val d = target.distanceToEdge(v0, v1)
      if (d < minDist) (d, true) else (minDist, false)
    }
    def distanceToCell(cell: Cell): Double = cell.distanceToCell(target)
    def samplePoint: Vec3 = target.center
  }

  /** A whole ShapeIndex as the thing measured FROM: min distance is the
    * min over the target geometry, computed with a recursive
    * ClosestEdgeQuery over the target index
    * (min_distance_targets.go:253-345). Interior tests cover one chain
    * start per connected component, plus the full-polygon special case.
    */
  final case class ShapeIndexTarget(targetIndex: ShapeIndex,
                                    includeInteriors: Boolean = true)
      extends DistanceTarget {
    private lazy val query = new ClosestEdgeQuery(targetIndex, includeInteriors)
    def updateMinDistance(v0: Vec3, v1: Vec3, minDist: Double): (Double, Boolean) = {
      val rs = query.findClosestEdges(EdgeTarget(v0, v1), 1, minDist)
      rs.headOption match {
        case Some(r) if r.distance < minDist => (r.distance, true)
        case _ => (minDist, false)
      }
    }
    def distanceToCell(cell: Cell): Double = {
      val rs = query.findClosestEdges(CellTarget(cell), 1)
      if (rs.isEmpty) ChordAngle.Straight + 1 else rs.head.distance
    }
    def samplePoint: Vec3 = samplePoints.headOption.getOrElse(
      EdgeCrossings.originPoint)
    override def samplePoints: Seq[Vec3] = {
      val out = scala.collection.mutable.ArrayBuffer[Vec3]()
      for (id <- 0 until targetIndex.numShapes) {
        val shape = targetIndex.shape(id)
        if (shape != null) {
          val starts = shape.chainStarts
          if (starts.nonEmpty) out ++= starts
          else {
            // full polygons have chains but no edges: any point works,
            // and the empty polygon contributes nothing
            val (p, contained) = shape.referencePoint
            if (contained) out += p
          }
        }
      }
      out.toSeq
    }
  }

  /** One result: (shapeId, edgeId, squared-chord distance). Interior hits
    * carry edgeId = -1 and distance 0 (edge_query.go:428-439).
    */
  final case class Result(shapeId: Int, edgeId: Int, distance: Double)
}

final class ClosestEdgeQuery(index: ShapeIndex,
                             includeInteriors: Boolean = true,
                             maxBruteForceEdges: Int = 180) {
  import ClosestEdgeQuery._

  private lazy val totalEdges =
    (0 until index.numShapes).iterator
      .map(id => Option(index.shape(id)).map(_.numEdges).getOrElse(0)).sum

  /** The k closest edges within distanceLimit (squared chord), sorted by
    * (distance, shapeId, edgeId) with ties broken deterministically.
    */
  def findClosestEdges(target: DistanceTarget, k: Int,
                       distanceLimit: Double = ChordAngle.Straight + 1): Seq[Result] = {
    val results = scala.collection.mutable.ArrayBuffer[Result]()

    // Interior hits: shapes containing ANY connected component of the
    // target (one sample point per component suffices).
    if (includeInteriors) {
      val q = new ContainsPointQuery(index, VertexModel.SemiOpen)
      val hit = scala.collection.mutable.SortedSet[Int]()
      target.samplePoints.foreach(p => hit ++= q.containingShapes(p))
      hit.foreach(shapeId => results += Result(shapeId, -1, 0.0))
    }

    var limit = distanceLimit
    val best = scala.collection.mutable.PriorityQueue[Result]()(
      Ordering.by[Result, (Double, Int, Int)](r =>
        (r.distance, r.shapeId, r.edgeId))) // max-heap on ordering

    def offer(shapeId: Int, edgeId: Int, dist: Double): Unit = {
      // accept ties at the limit: the heap's (dist, shapeId, edgeId)
      // max-eviction reproduces the deterministic brute-force tie-break
      if (dist > limit) return
      best.enqueue(Result(shapeId, edgeId, dist))
      if (best.size > k) best.dequeue()
      if (best.size == k) limit = math.min(limit, best.head.distance)
    }

    // An edge may appear in several index cells; test each once
    // (edge_query.go maybeAddResult's dedup map) — duplicates in the
    // top-k heap would otherwise evict genuine results.
    val tested = scala.collection.mutable.HashSet[Long]()
    def scanEdges(shapeId: Int, edges: Iterator[Int]): Unit = {
      val shape = index.shape(shapeId)
      edges.foreach { e =>
        if (tested.add((shapeId.toLong << 32) | (e.toLong & 0xFFFFFFFFL))) {
          val (v0, v1) = shape.edge(e)
          val (d, ok) = target.updateMinDistance(v0, v1,
            Math.nextUp(limit)) // inclusive: ties at the limit must enter
          if (ok) offer(shapeId, e, d)
        }
      }
    }

    if (totalEdges <= maxBruteForceEdges) {
      for (shapeId <- 0 until index.numShapes if index.shape(shapeId) != null)
        scanEdges(shapeId, (0 until index.shape(shapeId).numEdges).iterator)
    } else {
      // Best-first over index cells with exact per-cell lower bounds.
      val it = index.iterator()
      val entries = scala.collection.mutable.ArrayBuffer[(Double, Long)]()
      it.begin()
      while (!it.done) {
        val cell = Cell.fromId(it.cellId)
        entries += ((target.distanceToCell(cell), it.cellId))
        it.next()
      }
      val queue = scala.collection.mutable.PriorityQueue[(Double, Long)](
        entries.toSeq: _*)(Ordering.by[(Double, Long), Double](_._1).reverse)
      var continue = true
      while (continue && queue.nonEmpty) {
        val (cellDist, cellId) = queue.dequeue()
        if (cellDist > limit && best.size == k) continue = false
        else {
          val cell = index.cellFor(cellId)
          cell.shapes.foreach { clipped =>
            scanEdges(clipped.shapeId, clipped.edges.iterator)
          }
        }
      }
    }

    // Cap at exactly k (the reference's maxResults contract,
    // edge_query.go): interior hits compete with edge hits for the
    // k slots rather than extending the result past it.
    val edgeResults = best.dequeueAll.reverse // ascending
    (results ++ edgeResults).distinct.toSeq
      .sortBy(r => (r.distance, r.shapeId, r.edgeId))
      .take(k)
  }

  /** Minimum distance (squared chord) from the target to the indexed
    * geometry; Straight+ when nothing is within the limit.
    */
  def distance(target: DistanceTarget): Double = {
    val rs = findClosestEdges(target, 1)
    if (rs.isEmpty) ChordAngle.Straight + 1 else rs.head.distance
  }

  /** Whether anything is within the given squared-chord limit
    * (edge_query.go:325-368 IsDistanceLess).
    */
  def isDistanceLess(target: DistanceTarget, limit: Double): Boolean = {
    val rs = findClosestEdges(target, 1, limit)
    rs.nonEmpty && rs.head.distance < limit
  }
}
