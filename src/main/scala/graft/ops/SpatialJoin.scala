package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Distributed point-in-polygon joins and radius joins.
  *
  * Architecture (SURVEY.md §3.1, replacing the reference's in-memory
  * ShapeIndex with Spark-native access paths):
  *
  *  - Per polygon, precompute a RegionCoverer covering and interior
  *    covering once (driver side, embarrassingly parallel over polygons).
  *  - Broadcast a flat interval index: coverings flattened to
  *    (rangeMin, rangeMax, polyId, isInterior) sorted by rangeMin. This is
  *    the Spark analogue of the reference's CellIndex
  *    (/root/reference/s2/cell_index.go:370-460).
  *  - A single narrow map stage probes each point's leaf cell against the
  *    broadcast index (binary search; candidates whose interval contains
  *    the leaf). Points landing in *interior* covering cells skip the
  *    exact test (the containsCenter fast path, shapeindex.go:373-470);
  *    boundary-cell candidates are refined with the exact crossing-parity
  *    PIP test.
  *
  * No shuffle at all: at 10^12 rows on 1000 executors this is a pure
  * map-side join, and the only data motion is the broadcast (O(polygons *
  * maxCells) longs). Skewed hot cells cost nothing here because there is
  * no partitioning by cell — each input split probes independently.
  */
object SpatialJoin {

  /** One polygon with its precomputed coverings. */
  final case class PolygonEntry(polyId: Long, loop: Loop,
                                covering: CellUnion, interior: CellUnion)

  /** Flat broadcastable interval index over polygon coverings. */
  final class CellIntervalIndex(
      val rangeMins: Array[Long], val rangeMaxs: Array[Long],
      val polyIds: Array[Long], val isInterior: Array[Boolean],
      val loops: Map[Long, Loop]) extends Serializable {

    /** All polygon ids whose covering may contain the leaf cell; exact
      * refine applied for boundary cells. Returns distinct ids.
      */
    def matchLeaf(leaf: Long, lat: Double, lng: Double): Array[Long] = {
      // First interval with rangeMax >= leaf; scan while rangeMin <= leaf.
      var lo = 0; var hi = rangeMins.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (java.lang.Long.compareUnsigned(rangeMaxs(mid), leaf) < 0) lo = mid + 1
        else hi = mid
      }
      if (lo == rangeMins.length) return Array.empty
      var out: scala.collection.mutable.ArrayBuffer[Long] = null
      var p: Vec3 = null
      var i = lo
      while (i < rangeMins.length &&
        java.lang.Long.compareUnsigned(rangeMins(i), leaf) <= 0) {
        if (java.lang.Long.compareUnsigned(leaf, rangeMaxs(i)) <= 0) {
          val pid = polyIds(i)
          val hit =
            if (isInterior(i)) true
            else {
              if (p == null) p = LatLng.toPointDegrees(lat, lng)
              loops(pid).containsPoint(p)
            }
          if (hit) {
            if (out == null) out = new scala.collection.mutable.ArrayBuffer[Long](2)
            if (!out.contains(pid)) out += pid
          }
        }
        i += 1
      }
      if (out == null) Array.empty else out.toArray
    }
  }

  /** Build coverings and the flat index for a polygon set. */
  def buildIndex(polygons: Seq[(Long, Loop)], maxCells: Int = 32): CellIntervalIndex = {
    val coverer = RegionCoverer(maxCells = maxCells)
    val entries = polygons.map { case (id, loop) =>
      PolygonEntry(id, loop, coverer.covering(loop), coverer.interiorCovering(loop))
    }
    // Flatten: boundary cells = covering - interior (cells fully inside skip
    // the exact test; cells merely intersecting need the refine).
    val rows = entries.flatMap { e =>
      val interior = e.interior
      val boundary = e.covering.difference(interior)
      interior.ids.map(c => (CellId.rangeMin(c), CellId.rangeMax(c), e.polyId, true)) ++
        boundary.ids.map(c => (CellId.rangeMin(c), CellId.rangeMax(c), e.polyId, false))
    }.sortBy(_._1)(Ordering.fromLessThan[Long](
      (a, b) => java.lang.Long.compareUnsigned(a, b) < 0))
    new CellIntervalIndex(
      rows.map(_._1).toArray, rows.map(_._2).toArray,
      rows.map(_._3).toArray, rows.map(_._4).toArray,
      entries.map(e => e.polyId -> e.loop).toMap)
  }

  /** Inner PIP join: returns `points` with an added `poly_id` column, one
    * output row per (point, containing polygon). Requires `lat`/`lng`
    * columns in degrees; computes the leaf cell on the fly if `cellCol`
    * is absent.
    */
  def pipJoin(spark: SparkSession, points: DataFrame, polygons: Seq[(Long, Loop)],
              latCol: String = "lat", lngCol: String = "lng",
              maxCells: Int = 32): DataFrame = {
    val index = buildIndex(polygons, maxCells)
    val bc = spark.sparkContext.broadcast(index)
    val matcher = udf((lat: Double, lng: Double) => {
      val leaf = CellId.fromLatLngDegrees(lat, lng)
      bc.value.matchLeaf(leaf, lat, lng)
    })
    points
      .withColumn("poly_id",
        explode(matcher(col(latCol), col(lngCol))))
  }

  /** Radius (distance) join against a set of query discs: returns points
    * with `query_id` for every query whose radius contains the point.
    * Same broadcast-index pattern with Cap coverings.
    */
  def radiusJoin(spark: SparkSession, points: DataFrame,
                 queries: Seq[(Long, Double, Double, Double)], // id, lat, lng, radiusMeters
                 latCol: String = "lat", lngCol: String = "lng",
                 maxCells: Int = 16): DataFrame = {
    val coverer = RegionCoverer(maxCells = maxCells)
    val caps = queries.map { case (id, qlat, qlng, rm) =>
      val center = LatLng.toPointDegrees(qlat, qlng)
      val cap = Cap.fromCenterRadians(center, Earth.angleFromMeters(rm))
      (id, qlat, qlng, rm, coverer.covering(cap), coverer.interiorCovering(cap))
    }
    val rows = caps.flatMap { case (id, _, _, _, cov, interior) =>
      val boundary = cov.difference(interior)
      interior.ids.map(c => (CellId.rangeMin(c), CellId.rangeMax(c), id, true)) ++
        boundary.ids.map(c => (CellId.rangeMin(c), CellId.rangeMax(c), id, false))
    }.sortBy(_._1)(Ordering.fromLessThan[Long](
      (a, b) => java.lang.Long.compareUnsigned(a, b) < 0))

    val qMeta = caps.map(c => c._1 -> ((c._2, c._3, c._4))).toMap
    val bcRows = spark.sparkContext.broadcast(
      (rows.map(_._1).toArray, rows.map(_._2).toArray,
        rows.map(_._3).toArray, rows.map(_._4).toArray, qMeta))

    val matcher = udf((lat: Double, lng: Double) => {
      val (mins, maxs, ids, inter, meta) = bcRows.value
      val leaf = CellId.fromLatLngDegrees(lat, lng)
      var lo = 0; var hi = mins.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (java.lang.Long.compareUnsigned(maxs(mid), leaf) < 0) lo = mid + 1
        else hi = mid
      }
      val out = new scala.collection.mutable.ArrayBuffer[Long](2)
      var i = lo
      while (i < mins.length &&
        java.lang.Long.compareUnsigned(mins(i), leaf) <= 0) {
        if (java.lang.Long.compareUnsigned(leaf, maxs(i)) <= 0) {
          val qid = ids(i)
          val hit = inter(i) || {
            val (qlat, qlng, rm) = meta(qid)
            LatLng.distance(
              lat * LatLng.DegToRad, lng * LatLng.DegToRad,
              qlat * LatLng.DegToRad, qlng * LatLng.DegToRad) <=
              Earth.angleFromMeters(rm)
          }
          if (hit && !out.contains(qid)) out += qid
        }
        i += 1
      }
      out.toArray
    })
    points.withColumn("query_id", explode(matcher(col(latCol), col(lngCol))))
  }

  /** Lat/lng-rectangle join: returns points with `rect_id` for every rect
    * containing the point. Drives the same covering + interior-fast-path
    * machinery as the polygon join; the exact refine is the (cheap) closed
    * rect containment, so results are independently SQL-checkable.
    * Rects given as (id, latLoDeg, lngLoDeg, latHiDeg, lngHiDeg).
    */
  def rectJoin(spark: SparkSession, points: DataFrame,
               rects: Seq[(Long, Double, Double, Double, Double)],
               latCol: String = "lat", lngCol: String = "lng",
               maxCells: Int = 32): DataFrame = {
    val coverer = RegionCoverer(maxCells = maxCells)
    val entries = rects.map { case (id, latLo, lngLo, latHi, lngHi) =>
      val rect = RectRegion.fromDegrees(latLo, lngLo, latHi, lngHi)
      (id, rect, coverer.covering(rect), coverer.interiorCovering(rect))
    }
    val rows = entries.flatMap { case (id, _, cov, interior) =>
      val boundary = cov.difference(interior)
      interior.ids.map(c => (CellId.rangeMin(c), CellId.rangeMax(c), id, true)) ++
        boundary.ids.map(c => (CellId.rangeMin(c), CellId.rangeMax(c), id, false))
    }.sortBy(_._1)(Ordering.fromLessThan[Long](
      (a, b) => java.lang.Long.compareUnsigned(a, b) < 0))
    val rectMap = entries.map(e => e._1 -> e._2).toMap
    val bc = spark.sparkContext.broadcast(
      (rows.map(_._1).toArray, rows.map(_._2).toArray,
        rows.map(_._3).toArray, rows.map(_._4).toArray, rectMap))
    val matcher = udf((lat: Double, lng: Double) => {
      val (mins, maxs, ids, inter, rectsM) = bc.value
      val leaf = CellId.fromLatLngDegrees(lat, lng)
      var lo = 0; var hi = mins.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (java.lang.Long.compareUnsigned(maxs(mid), leaf) < 0) lo = mid + 1
        else hi = mid
      }
      val out = new scala.collection.mutable.ArrayBuffer[Long](2)
      var i = lo
      while (i < mins.length &&
        java.lang.Long.compareUnsigned(mins(i), leaf) <= 0) {
        if (java.lang.Long.compareUnsigned(leaf, maxs(i)) <= 0) {
          val rid = ids(i)
          val hit = inter(i) || rectsM(rid).rect.containsLatLng(
            lat * LatLng.DegToRad, lng * LatLng.DegToRad)
          if (hit && !out.contains(rid)) out += rid
        }
        i += 1
      }
      out.toArray
    })
    points.withColumn("rect_id", explode(matcher(col(latCol), col(lngCol))))
  }

  /** kNN join: for each query point, the k nearest data points by chord
    * angle. Implementation = iterative cap-radius expansion (the
    * distributed analogue of the reference's best-first cell search,
    * edge_query.go:527-569): start from a density-derived radius, join,
    * keep queries that found >= k, double the radius for the rest.
    * Final exact re-rank by chord distance in a per-query window top-k.
    */
  def knnJoin(spark: SparkSession, points: DataFrame,
              queries: Seq[(Long, Double, Double)], k: Int,
              latCol: String = "lat", lngCol: String = "lng",
              initialRadiusMeters: Double = 100000,
              maxRounds: Int = 8,
              tieBreakCol: String = null): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    var pending = queries
    var radius = initialRadiusMeters
    var acc: DataFrame = null
    var round = 0
    while (pending.nonEmpty && round < maxRounds) {
      val qs = pending.map(q => (q._1, q._2, q._3, radius))
      val joined = radiusJoin(spark, points, qs, latCol, lngCol)
        .withColumn("q_lat", qLatCol(qs))
        .withColumn("q_lng", qLngCol(qs))
        .withColumn("dist_rad",
          graft.functions.S2.distance(col("q_lat"), col("q_lng"), col(latCol), col(lngCol)))
      val counts = joined.groupBy("query_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val satisfied = pending.filter(q => counts.getOrElse(q._1, 0L) >= k).map(_._1).toSet
      val done = joined.filter(col("query_id").isInCollection(satisfied))
      acc = if (acc == null) done else acc.unionByName(done)
      pending = pending.filterNot(q => satisfied.contains(q._1))
      radius *= 2
      round += 1
    }
    if (pending.nonEmpty) {
      // Fall back to brute force for stragglers (e.g. empty regions):
      // cross join the few remaining queries with all points.
      val qDf = spark.createDataFrame(pending).toDF("query_id", "q_lat", "q_lng")
      val brute = points.crossJoin(broadcast(qDf))
        .withColumn("dist_rad",
          graft.functions.S2.distance(col("q_lat"), col("q_lng"), col(latCol), col(lngCol)))
      acc = if (acc == null) brute else acc.unionByName(brute)
    }
    val order =
      if (tieBreakCol == null) Seq(col("dist_rad").asc)
      else Seq(col("dist_rad").asc, col(tieBreakCol).asc)
    val w = Window.partitionBy("query_id").orderBy(order: _*)
    acc.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  private def qLatCol(qs: Seq[(Long, Double, Double, Double)]): Column = {
    val m = map(qs.flatMap(q => Seq(lit(q._1), lit(q._2))): _*)
    element_at(m, col("query_id"))
  }

  private def qLngCol(qs: Seq[(Long, Double, Double, Double)]): Column = {
    val m = map(qs.flatMap(q => Seq(lit(q._1), lit(q._3))): _*)
    element_at(m, col("query_id"))
  }
}
