package graft.core

/** Union of possibly-overlapping regions
  * (/root/reference/s2/regionunion.go:15-75): ContainsCell only reports
  * true when ONE member fully contains the cell, so coverings of
  * tiling/overlapping unions may use fewer than maxCells (the coverer
  * subdivides along internal borders, then normalization re-merges
  * sibling groups) — fine for disjoint unions, disclosed otherwise.
  */
final case class RegionUnion(regions: Seq[S2Region]) extends S2Region {

  def capBound: Cap = RectRegion(rectBound).capBound

  def rectBound: SphereRect = {
    var r = SphereRect.empty
    regions.foreach(reg => r = r.union(reg.rectBound))
    r
  }

  def containsCell(cell: Cell): Boolean = regions.exists(_.containsCell(cell))

  def intersectsCell(cell: Cell): Boolean = regions.exists(_.intersectsCell(cell))

  def containsPoint(p: Vec3): Boolean = regions.exists(_.containsPoint(p))

  def cellUnionBound: Array[Long] = capBound.cellUnionBound
}

/** Compact dictionary encoding for integer sequences and sets
  * (/root/reference/s2/lexicon.go:15-175): duplicate label sets in a
  * (cell, labels) index are stored once and referenced by a 32-bit id.
  * Unlike the reference (which keys on the adler32 hash alone), hash
  * hits verify content, so colliding sequences get distinct ids.
  */
final class SequenceLexicon {
  private val values = scala.collection.mutable.ArrayBuffer[Int]()
  private val begins = scala.collection.mutable.ArrayBuffer[Int](0)
  private val byHash = scala.collection.mutable.HashMap[Int, List[Int]]()

  private def hashSet(s: Seq[Int]): Int = {
    var h = 1
    s.foreach(v => h = 31 * h + v)
    h
  }

  /** Add a sequence if absent; ids are sequential from 0. */
  def add(ids: Seq[Int]): Int = {
    val h = hashSet(ids)
    for (cand <- byHash.getOrElse(h, Nil)) {
      if (sequence(cand) == ids) return cand
    }
    values ++= ids
    begins += values.length
    val id = begins.length - 2
    byHash(h) = id :: byHash.getOrElse(h, Nil)
    id
  }

  def sequence(id: Int): Seq[Int] = values.slice(begins(id), begins(id + 1)).toSeq

  def size: Int = begins.length - 1

  def clear(): Unit = { values.clear(); begins.clear(); begins += 0; byHash.clear() }
}

/** Sets of non-negative ints with implicit empty/singleton encoding
  * (lexicon.go:27-95): empty = MinValue, singleton = the element itself,
  * larger sets = bitwise complement of a SequenceLexicon id over the
  * sorted deduped values.
  */
final class IdSetLexicon {
  val EmptySetId: Int = Int.MinValue
  private val seqLex = new SequenceLexicon

  def add(ids: Seq[Int]): Int = {
    if (ids.isEmpty) return EmptySetId
    if (ids.length == 1) return ids.head
    val set = ids.distinct.sorted
    if (set.length == 1) return set.head
    ~seqLex.add(set)
  }

  def idSet(setId: Int): Seq[Int] = {
    if (setId >= 0) Seq(setId)
    else if (setId == EmptySetId) Seq.empty
    else seqLex.sequence(~setId)
  }

  def clear(): Unit = seqLex.clear()
}
