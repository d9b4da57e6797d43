package graft.core

/** Vertex alignment ("dynamic timewarp") between polylines
  * (/root/reference/s2/polyline_alignment.go:15-508): a warp is a
  * monotone matching between vertex sequences; its cost is the summed
  * chordal distance over matched pairs; the optimal alignment minimizes
  * that cost. Chordal (not angular) distance is deliberate — any metric
  * with the triangle inequality works and it avoids per-cell atans.
  *
  * Exact alignment is the classic O(A*B) DP; the cost-only variant runs
  * in O(B) space. The approximate alignment is the FastDTW-style
  * coarsen/align/refine recursion the reference's window machinery
  * (upsample + dilate) exists for: align half-resolution polylines,
  * project the warp path up as a search window, dilate by the radius,
  * and re-run the windowed DP — O(max(A,B)) cells for constant radius.
  */
object PolylineAlignment {

  /** [start, end) range of live columns in one window row. */
  final case class ColumnStride(start: Int, end: Int) {
    def inRange(index: Int): Boolean = start <= index && index < end
  }

  /** Stride where inRange is true for every non-negative index. */
  val AllColumnStride: ColumnStride = ColumnStride(-1, Int.MaxValue)

  /** Sparse monotone band matrix of live DP cells
    * (polyline_alignment.go:108-185 structural constraints).
    */
  final class Window(val strides: Array[ColumnStride]) {
    val rows: Int = strides.length
    val cols: Int = strides.last.end

    def isValid: Boolean = {
      if (rows <= 0 || cols <= 0 || strides.isEmpty ||
        strides(0).start != 0 || strides.last.end != cols) return false
      var prev = ColumnStride(-1, -1)
      strides.forall { curr =>
        val ok = curr.end > curr.start && curr.start >= prev.start &&
          curr.end >= prev.end
        prev = curr
        ok
      }
    }

    def columnStride(row: Int): ColumnStride = strides(row)
    def checkedColumnStride(row: Int): ColumnStride =
      if (row < 0) AllColumnStride else strides(row)

    /** Upscaled window (ApproxAlignment expansion step,
      * polyline_alignment.go:241-261).
      */
    def upsample(newRows: Int, newCols: Int): Window = {
      val rowScale = newRows.toDouble / rows
      val colScale = newCols.toDouble / cols
      Window.fromStrides(Array.tabulate(newRows) { row =>
        val from = strides(((row + 0.5) / rowScale).toInt)
        ColumnStride((colScale * from.start + 0.5).toInt,
          (colScale * from.end + 0.5).toInt)
      })
    }

    /** Morphological dilation by a square element of half-length radius
      * (polyline_alignment.go:263-284).
      */
    def dilate(radius: Int): Window = {
      Window.fromStrides(Array.tabulate(rows) { row =>
        val prevRow = math.max(0, row - radius)
        val nextRow = math.min(row + radius, rows - 1)
        ColumnStride(math.max(0, strides(prevRow).start - radius),
          math.min(strides(nextRow).end + radius, cols))
      })
    }

    def debugString: String = {
      val sb = new StringBuilder
      strides.foreach { row =>
        (0 until cols).foreach(c => sb.append(if (row.inRange(c)) " *" else " ."))
        sb.append('\n')
      }
      sb.toString
    }
  }

  object Window {
    def fromStrides(strides: Array[ColumnStride]): Window = new Window(strides)

    /** Window covering exactly the cells a warp path visits (the C++
      * windowFromWarpPath the Go port leaves as a TODO): each row's
      * stride spans the columns the monotone path touches in that row.
      */
    def fromWarpPath(path: Seq[(Int, Int)], rows: Int, cols: Int): Window = {
      val strides = Array.fill(rows)(ColumnStride(Int.MaxValue, Int.MinValue))
      path.foreach { case (r, c) =>
        val s = strides(r)
        strides(r) = ColumnStride(math.min(s.start, c), math.max(s.end, c + 1))
      }
      new Window(strides)
    }
  }

  /** Every other vertex (even indices) of p
    * (polyline_alignment.go:306-313).
    */
  def halfResolution(p: Polyline): Polyline = {
    val out = new scala.collection.mutable.ArrayBuffer[Vec3]()
    var i = 0
    while (i < p.vertices.length) { out += p.vertices(i); i += 2 }
    new Polyline(out.toArray)
  }

  /** (alignmentCost, forward warp path) of an optimal alignment. The
    * path starts at (0,0) and ends at (|a|-1, |b|-1).
    */
  final case class VertexAlignment(alignmentCost: Double,
                                   warpPath: Seq[(Int, Int)])

  /** Optimal alignment cost only, in O(|b|) space
    * (polyline_alignment.go:385-404).
    */
  def exactVertexAlignmentCost(a: Polyline, b: Polyline): Double = {
    val bN = b.vertices.length
    val cost = Array.fill(bN)(Double.MaxValue)
    var leftDiagMinCost = 0.0
    for (row <- a.vertices.indices) {
      var col = 0
      while (col < bN) {
        val upCost = cost(col)
        cost(col) = math.min(leftDiagMinCost, upCost) +
          (a.vertices(row) - b.vertices(col)).norm
        leftDiagMinCost = math.min(cost(col), upCost)
        col += 1
      }
      leftDiagMinCost = Double.MaxValue
    }
    cost(bN - 1)
  }

  /** Optimal alignment with warp path, O(A*B) space
    * (polyline_alignment.go:408-418).
    */
  def exactVertexAlignment(a: Polyline, b: Polyline): VertexAlignment =
    dynamicTimewarp(a, b, Window.fromStrides(
      Array.fill(a.vertices.length)(ColumnStride(0, b.vertices.length))))

  /** Windowed DP fill + walk-back (polyline_alignment.go:442-505). */
  def dynamicTimewarp(a: Polyline, b: Polyline, w: Window): VertexAlignment = {
    val rows = a.vertices.length
    val cols = b.vertices.length
    val costs = Array.fill(rows, cols)(0.0)

    def tableCost(row: Int, col: Int, stride: ColumnStride): Double =
      if (row < 0 && col < 0) 0.0
      else if (row < 0 || col < 0 || !stride.inRange(col)) Double.MaxValue
      else costs(row)(col)

    var prev = AllColumnStride
    for (row <- 0 until rows) {
      val curr = w.columnStride(row)
      var col = curr.start
      while (col < curr.end) {
        val dCost = tableCost(row - 1, col - 1, prev)
        val uCost = tableCost(row - 1, col, prev)
        val lCost = tableCost(row, col - 1, curr)
        costs(row)(col) = math.min(dCost, math.min(uCost, lCost)) +
          (a.vertices(row) - b.vertices(col)).norm
        col += 1
      }
      prev = curr
    }

    // Walk back from the bottom-right corner, preferring diagonal then
    // up then left on ties (shorter warp paths win, like the reference).
    val path = new scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var row = rows - 1
    var col = cols - 1
    var curr = w.checkedColumnStride(row)
    prev = w.checkedColumnStride(row - 1)
    while (row >= 0 && col >= 0) {
      path += ((row, col))
      val dCost = tableCost(row - 1, col - 1, prev)
      val uCost = tableCost(row - 1, col, prev)
      val lCost = tableCost(row, col - 1, curr)
      if (dCost <= uCost && dCost <= lCost) {
        row -= 1; col -= 1
        curr = w.checkedColumnStride(row)
        prev = w.checkedColumnStride(row - 1)
      } else if (uCost <= lCost) {
        row -= 1
        curr = w.checkedColumnStride(row)
        prev = w.checkedColumnStride(row - 1)
      } else {
        col -= 1
      }
    }
    VertexAlignment(costs(rows - 1)(cols - 1), path.reverse.toSeq)
  }

  /** FastDTW-style approximate alignment: exact below the base-case
    * size, else align half-resolution lines recursively, upsample the
    * resulting path's window, dilate by radius, and solve the windowed
    * DP. Cost is within a few percent of exact for radius >= 1 on
    * real trajectories; runtime O(max(A,B) * radius).
    */
  def approxVertexAlignment(a: Polyline, b: Polyline,
                            radius: Int = 2): VertexAlignment = {
    val aN = a.vertices.length
    val bN = b.vertices.length
    if (aN <= radius + 2 || bN <= radius + 2) return exactVertexAlignment(a, b)
    val coarse = approxVertexAlignment(halfResolution(a), halfResolution(b), radius)
    val w = Window.fromWarpPath(coarse.warpPath,
      (aN + 1) / 2, (bN + 1) / 2).upsample(aN, bN).dilate(radius)
    dynamicTimewarp(a, b, w)
  }

  def approxVertexAlignmentCost(a: Polyline, b: Polyline, radius: Int = 2): Double =
    approxVertexAlignment(a, b, radius).alignmentCost

  /** Index of the polyline minimizing the summed alignment cost to all
    * others (GetMedoidPolyline semantics; ties break to the lowest
    * index). Exact costs unless approx is set.
    */
  def medoidPolyline(lines: Seq[Polyline], approx: Boolean = false): Int = {
    require(lines.nonEmpty)
    def cost(a: Polyline, b: Polyline): Double =
      if (approx) approxVertexAlignmentCost(a, b)
      else exactVertexAlignmentCost(a, b)
    // cost is symmetric in its inputs' roles only up to path direction;
    // the reference sums cost(i, j) over all j != i, as here.
    val sums = lines.indices.map { i =>
      lines.indices.filter(_ != i).map(j => cost(lines(i), lines(j))).sum
    }
    sums.indexOf(sums.min)
  }
}
