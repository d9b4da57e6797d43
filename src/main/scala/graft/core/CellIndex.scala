package graft.core

import java.lang.{Long => JLong}

/** A collection of (cellId, label) pairs over possibly-overlapping,
  * possibly-duplicated cells (/root/reference/s2/cell_index.go:15-495):
  * e.g. one label per stored CellUnion. Internally the sphere is split
  * into non-overlapping leaf-cell ranges, each pointing at a node of a
  * preorder cell TREE whose ancestor chain enumerates exactly the pairs
  * intersecting that range.
  *
  * The distributed engine analogue is the flattened broadcast covering
  * table (ops/SpatialJoin CoveringIndex); this is the local access path
  * with the reference's exact range/contents iterator semantics,
  * including the intersection visitors the Go port lists as TODOs.
  */
final class CellIndex {
  import CellIndex._

  private[core] var cellTree = scala.collection.mutable.ArrayBuffer[Node]()
  private[core] var rangeNodes = scala.collection.mutable.ArrayBuffer[RangeNode]()
  private var built = false

  /** Queue a (cellId, label) pair; call build() before iterating. */
  def add(id: Long, label: Int): Unit = {
    require(label >= 0, "labels must be non-negative")
    require(!built, "CellIndex is not dynamic: add before build")
    cellTree += Node(id, label, -1)
  }

  /** Add every cell of the union under one label. */
  def addCellUnion(cu: CellUnion, label: Int): Unit =
    cu.ids.foreach(add(_, label))

  /** Build the leaf-cell ranges and preorder cell tree
    * (cell_index.go:406-489): each pair contributes a push delta at its
    * range start and a pop delta just past its range end; sweeping the
    * deltas in (startId asc, cellId desc, label asc) order maintains the
    * ancestor stack and emits one RangeNode per distinct boundary.
    */
  def build(): Unit = {
    if (built) return
    built = true
    final case class Delta(startId: Long, cellId: Long, label: Int)
    val deltas = scala.collection.mutable.ArrayBuffer[Delta]()
    for (node <- cellTree) {
      deltas += Delta(CellId.rangeMin(node.cellId), node.cellId, node.label)
      deltas += Delta(CellId.next(CellId.rangeMax(node.cellId)),
        SentinelCellId, -1)
    }
    deltas += Delta(CellId.childBeginAtLevel(CellId.fromFace(0), CellId.MaxLevel),
      0L, -1)
    deltas += Delta(CellId.childEndAtLevel(CellId.fromFace(5), CellId.MaxLevel),
      0L, -1)
    val sorted = deltas.sortWith { (a, b) =>
      if (a.startId != b.startId) JLong.compareUnsigned(a.startId, b.startId) < 0
      else if (a.cellId != b.cellId) JLong.compareUnsigned(a.cellId, b.cellId) > 0
      else a.label < b.label
    }
    cellTree = scala.collection.mutable.ArrayBuffer[Node]()
    rangeNodes = scala.collection.mutable.ArrayBuffer[RangeNode]()
    var contents = -1
    var i = 0
    while (i < sorted.length) {
      val startId = sorted(i).startId
      while (i < sorted.length && sorted(i).startId == startId) {
        val d = sorted(i)
        if (d.label >= 0) {
          cellTree += Node(d.cellId, d.label, contents)
          contents = cellTree.length - 1
        } else if (d.cellId == SentinelCellId) {
          contents = cellTree(contents).parent
        }
        i += 1
      }
      rangeNodes += RangeNode(startId, contents)
    }
  }

  def rangeIterator(): RangeIterator = { build(); new RangeIterator(this, false) }
  def nonEmptyRangeIterator(): RangeIterator = { build(); new RangeIterator(this, true) }
  def contentsIterator(): ContentsIterator = { build(); new ContentsIterator(this) }

  /** Visit every (cellId, label) pair that intersects the target union,
    * each exactly once (the C++ VisitIntersectingCells the Go port lists
    * as a TODO); the visitor returns false to stop early. Target cells
    * are visited in increasing order, so the contents iterator's
    * monotone dedup applies across the whole walk.
    */
  def visitIntersectingCells(target: CellUnion,
                             visitor: (Long, Int) => Boolean): Boolean = {
    if (target.ids.isEmpty) return true
    build()
    val contents = contentsIterator()
    val range = rangeIterator()
    range.begin()
    var ti = 0
    while (ti < target.ids.length) {
      val cell = target.ids(ti)
      val rangeMax = CellId.rangeMax(cell)
      if (JLong.compareUnsigned(range.limitId, CellId.rangeMin(cell)) <= 0)
        range.seek(CellId.rangeMin(cell))
      while (JLong.compareUnsigned(range.startId, rangeMax) <= 0) {
        contents.startUnion(range)
        while (!contents.done) {
          if (!visitor(contents.cellId, contents.label)) return false
          contents.next()
        }
        range.next()
      }
      ti += 1
      // skip target cells entirely inside the current (already-visited)
      // range
      while (ti < target.ids.length && JLong.compareUnsigned(
        CellId.rangeMax(target.ids(ti)), range.startId) < 0) ti += 1
    }
    true
  }

  /** The distinct labels of all pairs intersecting the target union. */
  def intersectingLabels(target: CellUnion): Seq[Int] = {
    val out = scala.collection.mutable.SortedSet[Int]()
    visitIntersectingCells(target, (_, label) => { out += label; true })
    out.toSeq
  }
}

object CellIndex {
  val SentinelCellId: Long = -1L // all ones: larger than any valid cell id
  val DoneContents: Int = -1

  final case class Node(cellId: Long, label: Int, parent: Int)
  final case class RangeNode(startId: Long, contents: Int)

  /** Iterator over the non-overlapping leaf-cell ranges covering the
    * sphere (cell_index.go:67-215); optionally skipping empty ranges.
    */
  final class RangeIterator(index: CellIndex, nonEmpty: Boolean) {
    private val nodes = index.rangeNodes
    private var pos = 0

    def startId: Long = nodes(pos).startId
    def limitId: Long = nodes(pos + 1).startId
    def isEmpty: Boolean = nodes(pos).contents == DoneContents
    def done: Boolean = pos >= nodes.length - 1
    private[CellIndex] def contents: Int = nodes(pos).contents

    def begin(): Unit = {
      pos = 0
      while (nonEmpty && isEmpty && !done) pos += 1
    }
    def next(): Unit = {
      pos += 1
      while (nonEmpty && isEmpty && !done) pos += 1
    }
    def finish(): Unit = pos = nodes.length - 1
    def advance(n: Int): Boolean = {
      if (n >= nodes.length - 1 - pos) return false
      pos += n
      true
    }
    def prev(): Boolean = {
      if (nonEmpty) nonEmptyPrev()
      else rawPrev()
    }
    private def rawPrev(): Boolean = {
      if (pos == 0) return false
      pos -= 1
      true
    }
    private def nonEmptyPrev(): Boolean = {
      while (rawPrev()) {
        if (!isEmpty) return true
      }
      if (isEmpty && !done) next()
      false
    }
    /** First range with startId > target comes after pos; position at the
      * last range with startId <= target (always exists for valid leaf
      * targets).
      */
    def seek(target: Long): Unit = {
      var lo = 0
      var hi = nodes.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (JLong.compareUnsigned(nodes(mid).startId, target) <= 0) lo = mid + 1
        else hi = mid
      }
      pos = math.max(lo - 1, 0)
      while (nonEmpty && isEmpty && !done) pos += 1
    }
  }

  /** Iterator over the (cellId, label) pairs covering one or more leaf
    * cell ranges (cell_index.go:217-312). Visiting ranges in increasing
    * order reports each pair exactly once.
    */
  final class ContentsIterator(index: CellIndex) {
    private val cellTree = index.cellTree
    private var nodeCutoff = -1
    private var nextNodeCutoff = -1
    private var prevStartId = 0L
    private var node = Node(0L, DoneContents, -1)

    def clear(): Unit = {
      prevStartId = 0L
      nodeCutoff = -1
      nextNodeCutoff = -1
      node = node.copy(label = DoneContents)
    }
    def cellId: Long = node.cellId
    def label: Int = node.label
    def done: Boolean = node.label == DoneContents

    def next(): Unit = {
      if (node.parent <= nodeCutoff) {
        // already processed this node and its ancestors
        nodeCutoff = nextNodeCutoff
        node = node.copy(label = DoneContents)
      } else {
        node = cellTree(node.parent)
      }
    }

    def startUnion(r: RangeIterator): Unit = {
      if (JLong.compareUnsigned(r.startId, prevStartId) < 0)
        nodeCutoff = -1 // non-monotone visit: cannot suppress duplicates
      prevStartId = r.startId
      val contents = r.contents
      if (contents <= nodeCutoff) node = node.copy(label = DoneContents)
      else node = cellTree(contents)
      // When visiting ancestors, stop as soon as the node index drops to
      // a previously visited one (preorder indexes: already reported).
      nextNodeCutoff = contents
    }
  }
}
