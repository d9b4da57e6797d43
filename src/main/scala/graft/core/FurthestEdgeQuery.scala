package graft.core

/** Furthest-edge queries over a ShapeIndex — the max-distance mirror of
  * ClosestEdgeQuery (/root/reference/s2/edge_query.go:268-285 with the
  * maxDistance targets of max_distance_targets.go:23-303): find the k
  * edges furthest from a point, edge, or cell target.
  *
  * Distance currency is squared chord length, like ClosestEdgeQuery; the
  * reference's inverted-distance trick (maxDistance = Pi - x ordering) is
  * expressed directly as a max-heap/min-eviction search here. Per-cell
  * pruning uses exact max-distance upper bounds from the Cell kernels
  * (a cell whose max distance is below the current k-th best cannot
  * contribute). Interior hits are shapes containing the ANTIPODE of the
  * target (max_distance_targets.go:84-92): their distance is Straight,
  * the maximum possible, reported with edgeId = -1.
  */
object FurthestEdgeQuery {

  /** What is being measured against (max_distance_targets.go). */
  sealed trait DistanceTarget {
    /** Possibly-improved max distance from the target to edge (v0,v1). */
    def updateMaxDistance(v0: Vec3, v1: Vec3, maxDist: Double): (Double, Boolean)
    /** Upper bound on the distance from the target to any point of cell. */
    def maxDistanceToCell(cell: Cell): Double
    /** Antipode of a target sample point, for interior containment. */
    def antipodeSamplePoint: Vec3
    /** One antipode per connected component of the target. */
    def antipodeSamplePoints: Seq[Vec3] = Seq(antipodeSamplePoint)
  }

  final case class PointTarget(p: Vec3) extends DistanceTarget {
    def updateMaxDistance(v0: Vec3, v1: Vec3, maxDist: Double): (Double, Boolean) =
      EdgeDistances.updateMaxDistance(p, v0, v1, maxDist)
    def maxDistanceToCell(cell: Cell): Double = cell.maxDistance(p)
    def antipodeSamplePoint: Vec3 = p * -1
  }

  final case class EdgeTarget(a: Vec3, b: Vec3) extends DistanceTarget {
    def updateMaxDistance(v0: Vec3, v1: Vec3, maxDist: Double): (Double, Boolean) = {
      val d = EdgeDistances.edgePairMaxDistance(a, b, v0, v1)
      if (d > maxDist) (d, true) else (maxDist, false)
    }
    def maxDistanceToCell(cell: Cell): Double = cell.maxDistanceToEdge(a, b)
    def antipodeSamplePoint: Vec3 = a * -1
  }

  final case class CellTarget(target: Cell) extends DistanceTarget {
    def updateMaxDistance(v0: Vec3, v1: Vec3, maxDist: Double): (Double, Boolean) = {
      val d = target.maxDistanceToEdge(v0, v1)
      if (d > maxDist) (d, true) else (maxDist, false)
    }
    def maxDistanceToCell(cell: Cell): Double = cell.maxDistanceToCell(target)
    def antipodeSamplePoint: Vec3 = target.center * -1
  }

  /** A whole ShapeIndex as the max-distance source: the max over the
    * target geometry via a recursive FurthestEdgeQuery
    * (max_distance_targets.go:214-303).
    */
  final case class ShapeIndexTarget(targetIndex: ShapeIndex,
                                    includeInteriors: Boolean = true)
      extends DistanceTarget {
    private lazy val query = new FurthestEdgeQuery(targetIndex, includeInteriors)
    def updateMaxDistance(v0: Vec3, v1: Vec3, maxDist: Double): (Double, Boolean) = {
      val rs = query.findFurthestEdges(EdgeTarget(v0, v1), 1, maxDist)
      rs.headOption match {
        case Some(r) if r.distance > maxDist => (r.distance, true)
        case _ => (maxDist, false)
      }
    }
    def maxDistanceToCell(cell: Cell): Double = {
      val rs = query.findFurthestEdges(CellTarget(cell), 1)
      if (rs.isEmpty) -1.0 else rs.head.distance
    }
    def antipodeSamplePoint: Vec3 = antipodeSamplePoints.headOption
      .getOrElse(EdgeCrossings.originPoint * -1)
    override def antipodeSamplePoints: Seq[Vec3] = {
      val out = scala.collection.mutable.ArrayBuffer[Vec3]()
      for (id <- 0 until targetIndex.numShapes) {
        val shape = targetIndex.shape(id)
        if (shape != null) {
          val starts = shape.chainStarts
          if (starts.nonEmpty) out ++= starts.map(_ * -1)
          else {
            val (p, contained) = shape.referencePoint
            if (contained) out += p * -1
          }
        }
      }
      out.toSeq
    }
  }

  /** One result: (shapeId, edgeId, squared-chord distance). Interior hits
    * (shape contains the target's antipode) carry edgeId = -1 and
    * distance Straight.
    */
  final case class Result(shapeId: Int, edgeId: Int, distance: Double)
}

final class FurthestEdgeQuery(index: ShapeIndex,
                              includeInteriors: Boolean = true,
                              maxBruteForceEdges: Int = 180) {
  import FurthestEdgeQuery._

  private lazy val totalEdges =
    (0 until index.numShapes).iterator
      .map(id => Option(index.shape(id)).map(_.numEdges).getOrElse(0)).sum

  /** The k furthest edges with distance above distanceLimit (squared
    * chord), sorted by (distance DESC, shapeId, edgeId) with ties broken
    * deterministically.
    */
  def findFurthestEdges(target: DistanceTarget, k: Int,
                        distanceLimit: Double = -1.0): Seq[Result] = {
    val results = scala.collection.mutable.ArrayBuffer[Result]()

    // Interior hits: shapes containing the antipode of ANY connected
    // component of the target are at the maximum possible distance
    // (max_distance_targets.go:84-92).
    if (includeInteriors) {
      val q = new ContainsPointQuery(index, VertexModel.SemiOpen)
      val hit = scala.collection.mutable.SortedSet[Int]()
      target.antipodeSamplePoints.foreach(p => hit ++= q.containingShapes(p))
      hit.foreach(shapeId => results += Result(shapeId, -1, ChordAngle.Straight))
    }

    var limit = distanceLimit
    // min-heap on (distance, -shapeId, -edgeId): evicting the head drops
    // the SMALLEST distance with the deterministic brute-force tie-break
    // (larger shape/edge ids evicted first at equal distance).
    val best = scala.collection.mutable.PriorityQueue[Result]()(
      Ordering.by[Result, (Double, Int, Int)](r =>
        (r.distance, -r.shapeId, -r.edgeId)).reverse)

    def offer(shapeId: Int, edgeId: Int, dist: Double): Unit = {
      if (dist < limit) return
      best.enqueue(Result(shapeId, edgeId, dist))
      if (best.size > k) best.dequeue()
      if (best.size == k) limit = math.max(limit, best.head.distance)
    }

    val tested = scala.collection.mutable.HashSet[Long]()
    def scanEdges(shapeId: Int, edges: Iterator[Int]): Unit = {
      val shape = index.shape(shapeId)
      edges.foreach { e =>
        if (tested.add((shapeId.toLong << 32) | (e.toLong & 0xFFFFFFFFL))) {
          val (v0, v1) = shape.edge(e)
          val (d, ok) = target.updateMaxDistance(v0, v1,
            Math.nextDown(limit)) // inclusive: ties at the limit must enter
          if (ok) offer(shapeId, e, d)
        }
      }
    }

    if (totalEdges <= maxBruteForceEdges) {
      for (shapeId <- 0 until index.numShapes if index.shape(shapeId) != null)
        scanEdges(shapeId, (0 until index.shape(shapeId).numEdges).iterator)
    } else {
      // Best-first over index cells with exact per-cell UPPER bounds,
      // largest bound first.
      val it = index.iterator()
      val entries = scala.collection.mutable.ArrayBuffer[(Double, Long)]()
      it.begin()
      while (!it.done) {
        val cell = Cell.fromId(it.cellId)
        entries += ((target.maxDistanceToCell(cell), it.cellId))
        it.next()
      }
      val queue = scala.collection.mutable.PriorityQueue[(Double, Long)](
        entries.toSeq: _*)(Ordering.by[(Double, Long), Double](_._1))
      var continue = true
      while (continue && queue.nonEmpty) {
        val (cellBound, cellId) = queue.dequeue()
        if (cellBound < limit && best.size == k) continue = false
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
    val edgeResults = best.dequeueAll.reverse // descending distance
    (results ++ edgeResults).distinct.toSeq
      .sortBy(r => (-r.distance, r.shapeId, r.edgeId))
      .take(k)
  }

  /** Maximum distance (squared chord) from the target to the indexed
    * geometry; negative when the index is empty.
    */
  def distance(target: DistanceTarget): Double = {
    val rs = findFurthestEdges(target, 1)
    if (rs.isEmpty) -1.0 else rs.head.distance
  }

  /** Whether anything is further than the given squared-chord limit
    * (edge_query.go IsDistanceGreater semantics).
    */
  def isDistanceGreater(target: DistanceTarget, limit: Double): Boolean = {
    val rs = findFurthestEdges(target, 1)
    rs.nonEmpty && rs.head.distance > limit
  }
}
