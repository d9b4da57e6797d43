package graft.ops

import org.apache.spark.broadcast.Broadcast
import graft.core._

/** Executor-local ShapeIndex cache keyed by broadcast id: operators that
  * query a broadcast shape set build the index once per executor JVM
  * (the reference's lazy one-time index build, shapeindex.go:789-863),
  * not once per row. Broadcast ids grow monotonically over a long-lived
  * executor's life, so the cache is a size-capped LRU: the oldest index
  * (from a long-finished job) is evicted, never the one the current
  * stage is probing.
  */
object IndexCache {
  private val MaxEntries = 32
  private val cache =
    new java.util.LinkedHashMap[Long, ShapeIndex](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, ShapeIndex]): Boolean =
        size() > MaxEntries
    }

  private def getOrBuild(id: Long)(build: => ShapeIndex): ShapeIndex =
    cache.synchronized {
      val hit = cache.get(id)
      if (hit != null) hit
      else { val idx = build; cache.put(id, idx); idx }
    }

  /** Index over a broadcast polyline set (ids map to shape ids by order). */
  def forPolylines(bc: Broadcast[Seq[(Long, Polyline)]]): ShapeIndex =
    getOrBuild(bc.id) {
      val idx = new ShapeIndex()
      bc.value.foreach { case (_, pl) => idx.add(PolylineShape(pl)) }
      idx.iterator() // force the one-time build
      idx
    }

  /** Index over a broadcast loop set. */
  def forLoops(bc: Broadcast[Seq[(Long, Loop)]]): ShapeIndex =
    getOrBuild(bc.id) {
      val idx = new ShapeIndex()
      bc.value.foreach { case (_, l) => idx.add(LoopShape(l)) }
      idx.iterator()
      idx
    }
}
