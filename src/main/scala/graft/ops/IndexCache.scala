package graft.ops

import org.apache.spark.broadcast.Broadcast
import graft.core._

/** Executor-local ShapeIndex cache keyed by broadcast id: operators that
  * query a broadcast shape set build the index once per executor JVM
  * (the reference's lazy one-time index build, shapeindex.go:789-863),
  * not once per row. Bounded since broadcast ids are few and monotone.
  */
object IndexCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, ShapeIndex]()

  /** Index over a broadcast polyline set (ids map to shape ids by order). */
  def forPolylines(bc: Broadcast[Seq[(Long, Polyline)]]): ShapeIndex =
    cache.computeIfAbsent(bc.id, _ => {
      val idx = new ShapeIndex()
      bc.value.foreach { case (_, pl) => idx.add(PolylineShape(pl)) }
      idx.iterator() // force the one-time build
      idx
    })

  /** Index over a broadcast loop set. */
  def forLoops(bc: Broadcast[Seq[(Long, Loop)]]): ShapeIndex =
    cache.computeIfAbsent(bc.id, _ => {
      val idx = new ShapeIndex()
      bc.value.foreach { case (_, l) => idx.add(LoopShape(l)) }
      idx.iterator()
      idx
    })
}
