package graft.core

import java.lang.{Long => JLong}
import scala.collection.mutable.ArrayBuffer

/** Normalized sorted set of cell ids — the covering/tiling currency and the
  * engine's relational set-operation layer (/root/reference/s2/cellunion.go).
  *
  * Stored as a sorted Array[Long] with unsigned ordering; maps 1:1 onto an
  * ArrayType(LongType) column. All ops preserve normalization: sorted, no
  * contained duplicates, no complete 4-sibling groups.
  */
final class CellUnion private (val ids: Array[Long]) extends S2Region {
  def size: Int = ids.length
  def isEmpty: Boolean = ids.isEmpty
  def apply(i: Int): Long = ids(i)

  /** Binary search: index of first element >= id (unsigned). */
  private def lowerBound(id: Long): Int = {
    var lo = 0; var hi = ids.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (JLong.compareUnsigned(ids(mid), id) < 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Region-containment of a single cell (cellunion.go:295-304). */
  def containsCellId(id: Long): Boolean = {
    val i = upperBound(id)
    if (i != ids.length && JLong.compareUnsigned(CellId.rangeMin(ids(i)), id) <= 0)
      return true
    i != 0 && JLong.compareUnsigned(CellId.rangeMax(ids(i - 1)), id) >= 0
  }

  /** Index of first element > id (unsigned). */
  private def upperBound(id: Long): Int = {
    var lo = 0; var hi = ids.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (JLong.compareUnsigned(id, ids(mid)) < 0) hi = mid else lo = mid + 1
    }
    lo
  }

  def intersectsCellId(id: Long): Boolean = {
    val i = upperBound(id)
    if (i != ids.length &&
      JLong.compareUnsigned(CellId.rangeMin(ids(i)), CellId.rangeMax(id)) <= 0)
      return true
    i != 0 &&
      JLong.compareUnsigned(CellId.rangeMax(ids(i - 1)), CellId.rangeMin(id)) >= 0
  }

  def containsUnion(o: CellUnion): Boolean = o.ids.forall(containsCellId)
  def intersectsUnion(o: CellUnion): Boolean = ids.exists(o.intersectsCellId)

  def leafCellsCovered: Long = {
    var n = 0L
    var i = 0
    while (i < ids.length) {
      n += 1L << ((CellId.MaxLevel - CellId.level(ids(i))) << 1)
      i += 1
    }
    n
  }

  def averageArea: Double =
    Metric.AvgArea.value(CellId.MaxLevel) * leafCellsCovered.toDouble

  /** UNION (cellunion.go:51-59). */
  def union(o: CellUnion): CellUnion =
    CellUnion.normalized(ids ++ o.ids)

  /** INTERSECT via two-pointer merge with skip (cellunion.go:61-111). */
  def intersection(o: CellUnion): CellUnion = {
    val x = ids; val y = o.ids
    val out = new ArrayBuffer[Long]()
    var i = 0; var j = 0
    while (i < x.length && j < y.length) {
      val iMin = CellId.rangeMin(x(i))
      val jMin = CellId.rangeMin(y(j))
      if (JLong.compareUnsigned(iMin, jMin) > 0) {
        if (JLong.compareUnsigned(x(i), CellId.rangeMax(y(j))) <= 0) {
          out += x(i); i += 1
        } else {
          var jj = j + 1
          while (jj < y.length && JLong.compareUnsigned(y(jj), iMin) < 0) jj += 1
          j = jj
          if (JLong.compareUnsigned(x(i), CellId.rangeMax(y(j - 1))) <= 0) j -= 1
        }
      } else if (JLong.compareUnsigned(jMin, iMin) > 0) {
        if (JLong.compareUnsigned(y(j), CellId.rangeMax(x(i))) <= 0) {
          out += y(j); j += 1
        } else {
          var ii = i + 1
          while (ii < x.length && JLong.compareUnsigned(x(ii), jMin) < 0) ii += 1
          i = ii
          if (JLong.compareUnsigned(y(j), CellId.rangeMax(x(i - 1))) <= 0) i -= 1
        }
      } else {
        if (JLong.compareUnsigned(x(i), y(j)) < 0) { out += x(i); i += 1 }
        else { out += y(j); j += 1 }
      }
    }
    CellUnion.normalized(out.toArray)
  }

  /** Clip to a single cell — the partition pruning primitive
    * (cellunion.go:113-134).
    */
  def intersectionWithCellId(id: Long): CellUnion = {
    if (containsCellId(id)) return CellUnion.normalized(Array(id))
    val out = new ArrayBuffer[Long]()
    val idMax = CellId.rangeMax(id)
    var i = lowerBound(CellId.rangeMin(id))
    while (i < ids.length && JLong.compareUnsigned(ids(i), idMax) <= 0) {
      out += ids(i); i += 1
    }
    CellUnion.normalized(out.toArray)
  }

  /** EXCEPT via recursive subdivision (cellunion.go:136-186). */
  def difference(o: CellUnion): CellUnion = {
    val out = new ArrayBuffer[Long]()
    def diffInternal(xid: Long): Unit = {
      if (!o.intersectsCellId(xid)) { out += xid; return }
      if (o.containsCellId(xid)) return
      val kids = CellId.children(xid)
      var k = 0
      while (k < 4) { diffInternal(kids(k)); k += 1 }
    }
    ids.foreach(diffInternal)
    new CellUnion(out.toArray) // generated in sorted, non-mergeable order
  }

  /** Add a rim of neighbor cells at the given level (cellunion.go:475-495). */
  def expandAtLevel(level: Int): CellUnion = {
    val out = new ArrayBuffer[Long]()
    val levelLsb = CellId.lsbForLevel(level)
    var i = ids.length - 1
    while (i >= 0) {
      var id = ids(i)
      if (JLong.compareUnsigned(CellId.lsb(id), levelLsb) < 0) {
        id = CellId.parent(id, level)
        while (i > 0 && CellId.contains(id, ids(i - 1))) i -= 1
      }
      out += id
      out ++= CellId.allNeighbors(id, level)
      i -= 1
    }
    CellUnion.normalized(out.toArray)
  }

  /** Expand so all points within minRadius are covered (cellunion.go:506-520). */
  def expandByRadius(minRadiusRad: Double, maxLevelDiff: Int): CellUnion = {
    var minLevel = CellId.MaxLevel
    ids.foreach(id => minLevel = math.min(minLevel, CellId.level(id)))
    val radiusLevel = Metric.MinWidth.maxLevel(minRadiusRad)
    var cu = this
    if (radiusLevel == 0 && minRadiusRad > Metric.MinWidth.value(0))
      cu = cu.expandAtLevel(0)
    cu.expandAtLevel(math.min(minLevel + maxLevelDiff, radiusLevel))
  }

  /** Re-expand cells to satisfy minLevel/levelMod (cellunion.go:306-332). */
  def denormalize(minLevel: Int, levelMod: Int): CellUnion = {
    val out = new ArrayBuffer[Long]()
    ids.foreach { id =>
      val level = CellId.level(id)
      var newLevel = math.max(level, minLevel)
      if (levelMod > 1) {
        newLevel += (CellId.MaxLevel - (newLevel - minLevel)) % levelMod
        if (newLevel > CellId.MaxLevel) newLevel = CellId.MaxLevel
      }
      if (newLevel == level) out += id
      else {
        val end = CellId.childEndAtLevel(id, newLevel)
        var ci = CellId.childBeginAtLevel(id, newLevel)
        while (ci != end) { out += ci; ci = CellId.next(ci) }
      }
    }
    new CellUnion(out.toArray)
  }

  // S2Region interface (cellunion.go:340-395).
  def capBound: Cap = {
    if (ids.isEmpty) return Cap.empty
    var centroid = Vec3.zero
    ids.foreach { id =>
      val area = Metric.AvgArea.value(CellId.level(id))
      centroid = centroid + (CellId.toPoint(id) * area)
    }
    var cap =
      if (centroid == Vec3.zero) Cap.fromPoint(Vec3(1, 0, 0))
      else Cap.fromPoint(centroid.normalize)
    ids.foreach(id => cap = cap.addCap(Cell.fromId(id).capBound))
    cap
  }

  def rectBound: SphereRect = {
    var b = SphereRect.empty
    ids.foreach(id => b = b.union(Cell.fromId(id).rectBound))
    b
  }

  def containsCell(cell: Cell): Boolean = containsCellId(cell.id)
  def intersectsCell(cell: Cell): Boolean = intersectsCellId(cell.id)
  def containsPoint(p: Vec3): Boolean =
    containsCellId(CellId.fromPoint(p.x, p.y, p.z))
  def cellUnionBound: Array[Long] = capBound.cellUnionBound

  override def equals(o: Any): Boolean = o match {
    case c: CellUnion => java.util.Arrays.equals(ids, c.ids)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(ids)
  override def toString: String =
    ids.map(CellId.toToken).mkString("CellUnion(", ",", ")")
}

object CellUnion {
  val empty: CellUnion = new CellUnion(Array.empty)

  /** Wrap ids that are already sorted + normalized (trusted). */
  def fromNormalized(ids: Array[Long]): CellUnion = new CellUnion(ids)

  /** Sort (unsigned), drop contained, merge complete sibling groups
    * (cellunion.go:234-277).
    */
  def normalized(raw: Array[Long]): CellUnion = {
    val sorted = raw.clone()
    // unsigned sort: flip sign bit, sort signed, flip back
    var i = 0
    while (i < sorted.length) { sorted(i) = sorted(i) ^ Long.MinValue; i += 1 }
    java.util.Arrays.sort(sorted)
    i = 0
    while (i < sorted.length) { sorted(i) = sorted(i) ^ Long.MinValue; i += 1 }

    val out = new ArrayBuffer[Long](sorted.length)
    for (ci0 <- sorted) {
      var ci = ci0
      if (out.isEmpty || !CellId.contains(out.last, ci)) {
        while (out.nonEmpty && CellId.contains(ci, out.last)) out.remove(out.length - 1)
        while (out.length >= 3 &&
          areSiblings(out(out.length - 3), out(out.length - 2), out(out.length - 1), ci)) {
          out.remove(out.length - 1); out.remove(out.length - 1); out.remove(out.length - 1)
          ci = CellId.immediateParent(ci)
        }
        out += ci
      }
    }
    new CellUnion(out.toArray)
  }

  /** Whether four distinct cells share a parent (cellunion.go:408-426). */
  def areSiblings(a: Long, b: Long, c: Long, d: Long): Boolean = {
    if ((a ^ b ^ c) != d) return false
    var mask = CellId.lsb(d) << 1
    mask = ~(mask + (mask << 1))
    val idMasked = d & mask
    (a & mask) == idMasked && (b & mask) == idMasked &&
      (c & mask) == idMasked && !CellId.isFace(d)
  }

  /** Greedy tiling of the half-open leaf range [begin, end)
    * (cellunion.go:37-49).
    */
  def fromRange(begin: Long, end: Long): CellUnion = {
    val out = new ArrayBuffer[Long]()
    var id = CellId.maxTile(begin, end)
    while (id != end) {
      out += id
      id = CellId.maxTile(CellId.next(id), end)
    }
    new CellUnion(out.toArray)
  }
}
