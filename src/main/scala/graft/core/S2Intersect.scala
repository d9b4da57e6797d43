package graft.core

import java.lang.{Long => JLong}

/** All disjoint intersections of n cell unions via an interval sweep over
  * the Hilbert line (/root/reference/s2/s2intersect/s2intersect.go:17-60).
  *
  * Each input region contributes [rangeMin, rangeMax] intervals; a sweep
  * over sorted endpoints tracks which regions are active and emits, for
  * every maximal span covered by >= 2 regions, the set of region indices
  * active there plus the covering cells of the span.
  */
object S2Intersect {

  final case class Intersection(regions: Set[Int], covering: CellUnion)

  def find(unions: Seq[CellUnion]): Seq[Intersection] = {
    // events on the leaf-id lattice (leaf ids are odd, stepping by 2):
    // open at rangeMin, close at the first leaf AFTER the cell, which is
    // rangeMax + 2 (= rangeMax.Next() in reference terms) so span
    // endpoints stay valid CellUnion.fromRange leaf bounds.
    val events = scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]()
    for ((cu, idx) <- unions.zipWithIndex; id <- cu.ids) {
      events += ((CellId.rangeMin(id), +1, idx))
      events += ((CellId.rangeMax(id) + 2, -1, idx)) // never wraps for valid ids
    }
    val sorted = events.sortWith { (a, b) =>
      val c = JLong.compareUnsigned(a._1, b._1)
      if (c != 0) c < 0 else a._2 < b._2 // closes before opens at same pos
    }

    val active = scala.collection.mutable.Set[Int]()
    var spanStart = 0L
    val out = scala.collection.mutable.ArrayBuffer[Intersection]()
    val pending = scala.collection.mutable.Map[Set[Int], scala.collection.mutable.ArrayBuffer[(Long, Long)]]()

    for ((pos, delta, idx) <- sorted) {
      if (active.size >= 2 && JLong.compareUnsigned(spanStart, pos) < 0) {
        val key = active.toSet
        pending.getOrElseUpdate(key, scala.collection.mutable.ArrayBuffer()) +=
          ((spanStart, pos))
      }
      if (delta > 0) active += idx else active -= idx
      spanStart = pos
    }

    for ((regions, spans) <- pending.toSeq.sortBy(_._1.toSeq.sorted.mkString(","))) {
      var cu = CellUnion.empty
      for ((lo, hi) <- spans) cu = cu.union(CellUnion.fromRange(lo, hi))
      if (cu.size > 0) out += Intersection(regions, cu)
    }
    out.toSeq
  }
}
