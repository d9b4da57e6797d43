package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Distributed point-in-polygon / rect / radius / kNN joins.
  *
  * Architecture (SURVEY.md §3.1, replacing the reference's in-memory
  * ShapeIndex with Spark-native access paths):
  *
  *  - Per region, precompute a RegionCoverer covering and interior
  *    covering once (driver side, embarrassingly parallel over regions).
  *  - Broadcast a CoveringIndex: hash map from covering cell id to the
  *    regions it belongs to (with an interior flag). This is the Spark
  *    analogue of the reference's (cell, label) CellIndex
  *    (/root/reference/s2/cell_index.go:370-460), keyed for O(levels)
  *    point probes: a leaf cell is inside a covering cell iff that cell
  *    is one of its <= 31 ancestors, so lookup = one hash probe per
  *    distinct level present in the index. Correct under arbitrary
  *    overlap between different regions' coverings (an interval scan
  *    sorted by rangeMin is NOT — overlapping coverings break the
  *    monotonicity a rangeMax binary search needs).
  *  - A single narrow map stage probes each point's leaf cell. Points in
  *    *interior* covering cells skip the exact test (the containsCenter
  *    fast path, shapeindex.go:373-470); boundary candidates are refined
  *    exactly (crossing-parity PIP / rect containment / haversine).
  *
  * No shuffle at all: at 10^12 rows on 1000 executors this is a pure
  * map-side join, and the only data motion is the broadcast (O(regions *
  * maxCells) entries). Skewed hot cells cost nothing here because there
  * is no partitioning by cell — each input split probes independently.
  */
object SpatialJoin {

  /** Broadcastable covering index: covering cell id -> packed entries of
    * (regionId, isInterior). Probe with the leaf's ancestor chain.
    */
  final class CoveringIndex(cellToEntries: java.util.HashMap[Long, Array[Long]],
                            val levels: Array[Int]) extends Serializable {

    /** Candidate (regionId, isInterior) pairs for a leaf cell, packed as
      * regionId << 1 | interiorBit. Distinct regions may appear twice
      * (interior + boundary cells at different levels); callers dedup.
      */
    def candidates(leaf: Long): Array[Long] = {
      var out: Array[Long] = null
      var total = 0
      val hits = new Array[Array[Long]](levels.length)
      var i = 0
      while (i < levels.length) {
        val anc = CellId.parent(leaf, levels(i))
        val e = cellToEntries.get(anc)
        if (e != null) { hits(i) = e; total += e.length }
        i += 1
      }
      if (total == 0) return CoveringIndex.emptyLongs
      out = new Array[Long](total)
      var k = 0
      i = 0
      while (i < levels.length) {
        val e = hits(i)
        if (e != null) { System.arraycopy(e, 0, out, k, e.length); k += e.length }
        i += 1
      }
      out
    }
  }

  object CoveringIndex {
    private[SpatialJoin] val emptyLongs = Array.empty[Long]

    /** Build from (regionId, covering, interiorCovering) triples. */
    def build(entries: Seq[(Long, CellUnion, CellUnion)]): CoveringIndex = {
      val m = new java.util.HashMap[Long, Array[Long]]()
      val levels = scala.collection.mutable.SortedSet[Int]()
      def add(cell: Long, packed: Long): Unit = {
        levels += CellId.level(cell)
        val prev = m.get(cell)
        if (prev == null) m.put(cell, Array(packed))
        else m.put(cell, prev :+ packed)
      }
      for ((id, covering, interior) <- entries) {
        val boundary = covering.difference(interior)
        interior.ids.foreach(c => add(c, (id << 1) | 1L))
        boundary.ids.foreach(c => add(c, id << 1))
      }
      new CoveringIndex(m, levels.toArray)
    }
  }

  /** Generic covering join: emits `outCol` with the region id for every
    * region containing the point, refining boundary candidates with
    * `refine(regionId, lat, lng)`.
    */
  private def coveringJoin(spark: SparkSession, points: DataFrame,
                           entries: Seq[(Long, CellUnion, CellUnion)],
                           refine: (Long, Double, Double) => Boolean,
                           outCol: String, latCol: String, lngCol: String): DataFrame = {
    val index = CoveringIndex.build(entries)
    val bc = spark.sparkContext.broadcast((index, refine))
    // Native codegen expression (not a ScalaUDF): the probe runs inside
    // whole-stage codegen with primitive doubles, no boxing/encoder hops.
    val matcher = graft.functions.ColumnBridge.column(
      graft.functions.CoveringProbeExpr(
        graft.functions.ColumnBridge.expression(col(latCol)),
        graft.functions.ColumnBridge.expression(col(lngCol)), bc))
    points.withColumn(outCol, explode(matcher))
  }

  private val defaultCoverer = RegionCoverer(maxCells = 32)

  /** Inner PIP join against single-loop polygons: adds `poly_id`, one row
    * per (point, containing polygon).
    */
  /** Covering + interior covering per polygon — computed once and shared
    * between the size estimate and whichever join path runs (covering is
    * the dominant driver-side cost at real dimension-table sizes).
    */
  def polygonCoverings(polygons: Seq[(Long, Loop)],
                       maxCells: Int = 32): Seq[(Long, CellUnion, CellUnion)] = {
    val coverer = RegionCoverer(maxCells = maxCells)
    polygons.map { case (id, loop) =>
      (id, coverer.covering(loop), coverer.interiorCovering(loop))
    }
  }

  /** Coverings computed ON THE EXECUTORS: at real dimension-table sizes
    * (10^4+ polygons) the serial per-polygon RegionCoverer work dominates
    * the driver. Geometry ships out via the wire codec; only the
    * (id, covering, interiorCovering) triples come back (bounded:
    * <= 3*maxCells cells per polygon). Per-polygon results are
    * independent and deterministic, so the output is identical to the
    * driver-side polygonCoverings at any parallelism; ids are re-sorted
    * to keep downstream iteration order stable.
    */
  def polygonCoveringsDistributed(spark: SparkSession,
                                  polygons: Seq[(Long, Loop)],
                                  maxCells: Int = 32): Seq[(Long, CellUnion, CellUnion)] = {
    val enc = polygons.map { case (id, l) => (id, Codec.encodeLoop(l)) }
    val slices = math.max(spark.sparkContext.defaultParallelism,
      math.min(256, enc.size / 64 + 1))
    spark.sparkContext.parallelize(enc, slices)
      .map { case (id, bytes) =>
        val coverer = RegionCoverer(maxCells = maxCells)
        val loop = Codec.decodeLoop(bytes)
        (id, coverer.covering(loop), coverer.interiorCovering(loop))
      }
      .collect().toSeq.sortBy(_._1)
  }

  /** Estimated broadcast payload of the covering-index path: covering +
    * interior cells (16 B of packed entry + key share each) plus the wire
    * size of every geometry (broadcast once per polygon for the refine).
    */
  def estimateBroadcastBytes(polygons: Seq[(Long, Loop)],
                             coverings: Seq[(Long, CellUnion, CellUnion)]): Long =
    polygons.iterator.zip(coverings.iterator).map { case ((_, loop), (_, c, ic)) =>
      16L * (c.size + ic.size) + 24L * loop.numVertices + 64L
    }.sum

  def estimateBroadcastBytes(polygons: Seq[(Long, Loop)]): Long =
    estimateBroadcastBytes(polygons, polygonCoverings(polygons))

  /** The north rule's join chooser: broadcast covering-probe join when
    * the covering index + geometries fit the broadcast budget, the
    * cell-level sort-merge path otherwise. The default budget mirrors
    * Spark's autoBroadcastJoinThreshold scale (10 MB); pass the real
    * executor budget at deploy time. Coverings are computed exactly once
    * and reused by the chosen path.
    */
  def pipJoinAuto(spark: SparkSession, points: DataFrame,
                  polygons: Seq[(Long, Loop)],
                  latCol: String = "lat", lngCol: String = "lng",
                  maxCells: Int = 32,
                  broadcastBudgetBytes: Long = 10L * 1024 * 1024): DataFrame = {
    val coverings = polygonCoverings(polygons, maxCells)
    if (estimateBroadcastBytes(polygons, coverings) <= broadcastBudgetBytes)
      pipJoinPrecovered(spark, points, polygons, coverings, latCol, lngCol)
    else
      ShuffleSpatialJoin.pipJoinLarge(spark, points, polygons, latCol, lngCol,
        precomputed = Some(coverings))
  }

  def pipJoin(spark: SparkSession, points: DataFrame, polygons: Seq[(Long, Loop)],
              latCol: String = "lat", lngCol: String = "lng",
              maxCells: Int = 32): DataFrame =
    pipJoinPrecovered(spark, points, polygons,
      polygonCoverings(polygons, maxCells), latCol, lngCol)

  private def pipJoinPrecovered(spark: SparkSession, points: DataFrame,
                                polygons: Seq[(Long, Loop)],
                                coverings: Seq[(Long, CellUnion, CellUnion)],
                                latCol: String, lngCol: String): DataFrame = {
    val loopMap = polygons.toMap
    coveringJoin(spark, points, coverings,
      (rid, lat, lng) => loopMap(rid).containsPoint(LatLng.toPointDegrees(lat, lng)),
      "poly_id", latCol, lngCol)
  }

  /** PIP join against multi-loop polygons (holes included): parity refine. */
  def pipJoinPolygons(spark: SparkSession, points: DataFrame,
                      polygons: Seq[(Long, Polygon)],
                      latCol: String = "lat", lngCol: String = "lng",
                      maxCells: Int = 32): DataFrame = {
    val coverer = RegionCoverer(maxCells = maxCells)
    val entries = polygons.map { case (id, poly) =>
      (id, coverer.covering(poly), coverer.interiorCovering(poly))
    }
    val polyMap = polygons.toMap
    coveringJoin(spark, points, entries,
      (rid, lat, lng) => polyMap(rid).containsPoint(LatLng.toPointDegrees(lat, lng)),
      "poly_id", latCol, lngCol)
  }

  /** Lat/lng-rectangle join: adds `rect_id`. Rects as (id, latLo, lngLo,
    * latHi, lngHi) degrees.
    */
  def rectJoin(spark: SparkSession, points: DataFrame,
               rects: Seq[(Long, Double, Double, Double, Double)],
               latCol: String = "lat", lngCol: String = "lng",
               maxCells: Int = 32): DataFrame = {
    val coverer = RegionCoverer(maxCells = maxCells)
    val regions = rects.map { case (id, latLo, lngLo, latHi, lngHi) =>
      id -> RectRegion.fromDegrees(latLo, lngLo, latHi, lngHi)
    }
    val entries = regions.map { case (id, r) =>
      (id, coverer.covering(r), coverer.interiorCovering(r))
    }
    val rectMap = regions.toMap
    coveringJoin(spark, points, entries,
      (rid, lat, lng) => rectMap(rid).rect.containsLatLng(
        lat * LatLng.DegToRad, lng * LatLng.DegToRad),
      "rect_id", latCol, lngCol)
  }

  /** Radius join: adds `query_id` for each disc (id, lat, lng,
    * radiusMeters) containing the point.
    */
  def radiusJoin(spark: SparkSession, points: DataFrame,
                 queries: Seq[(Long, Double, Double, Double)],
                 latCol: String = "lat", lngCol: String = "lng",
                 maxCells: Int = 16): DataFrame = {
    val coverer = RegionCoverer(maxCells = maxCells)
    val entries = queries.map { case (id, qlat, qlng, rm) =>
      val cap = Cap.fromCenterRadians(
        LatLng.toPointDegrees(qlat, qlng), Earth.angleFromMeters(rm))
      (id, coverer.covering(cap), coverer.interiorCovering(cap))
    }
    val qMeta = queries.map(q => q._1 -> ((q._2, q._3, q._4))).toMap
    coveringJoin(spark, points, entries,
      (rid, lat, lng) => {
        val (qlat, qlng, rm) = qMeta(rid)
        LatLng.distance(lat * LatLng.DegToRad, lng * LatLng.DegToRad,
          qlat * LatLng.DegToRad, qlng * LatLng.DegToRad) <= Earth.angleFromMeters(rm)
      },
      "query_id", latCol, lngCol)
  }

  /** kNN join (driver-side query list): thin wrapper over knnJoinDF. */
  def knnJoin(spark: SparkSession, points: DataFrame,
              queries: Seq[(Long, Double, Double)], k: Int,
              latCol: String = "lat", lngCol: String = "lng",
              initialRadiusMeters: Double = 100000,
              tieBreakCol: String = null, maxRings: Int = 3): DataFrame = {
    import spark.implicits._
    knnJoinDF(spark, points, queries.toDF("query_id", "q_lat", "q_lng"), k,
      latCol, lngCol, initialRadiusMeters, tieBreakCol, maxRings)
  }

  def knnJoinDF(spark: SparkSession, points: DataFrame, queries: DataFrame,
                k: Int, latCol: String = "lat", lngCol: String = "lng",
                initialRadiusMeters: Double = 100000,
                tieBreakCol: String = null, maxRings: Int = 3): DataFrame =
    knnJoinDFStats(spark, points, queries, k, latCol, lngCol,
      initialRadiusMeters, tieBreakCol, maxRings)._1

  /** kNN join with a DataFrame query side, escalating through expanding
    * cell rings before paying a full scan (the iterative-deepening
    * analogue of the reference's best-first distance queries,
    * edge_query.go:527-569, with CellUnion.ExpandAtLevel's ring
    * semantics, cellunion.go:475-495):
    *
    *  1. Ring pass r (r = 0..maxRings-1, radius r_r = r0 * 4^r): pick the
    *     finest level whose min cell width covers r_r; every point within
    *     r_r of a query then lies in the query cell's 3x3 neighbor ring,
    *     so an equi-join on the ring cells finds ALL candidates within
    *     r_r. Queries with >= k candidates are satisfied — their global
    *     top-k is provably inside the ring candidate set. The rest
    *     escalate to the next, 4x-wider ring, where only THEY rejoin the
    *     points table.
    *  2. Brute pass: queries still unsatisfied after maxRings rings run
    *     against the full points table as a broadcast — the guaranteed-
    *     correct fallback, now reserved for genuinely empty regions
    *     instead of every sparse-region query.
    *
    * Each ring's candidate set persists to disk so the satisfied-count
    * job and the final output read one scan's work; the escalation
    * check per ring is a count on the (small, driver-provided) query
    * table. This mirrors the reference's brute-below-threshold vs
    * best-first split (edge_query.go:475-491).
    */
  def knnJoinDFStats(spark: SparkSession, points: DataFrame, queries: DataFrame,
                     k: Int, latCol: String = "lat", lngCol: String = "lng",
                     initialRadiusMeters: Double = 100000,
                     tieBreakCol: String = null,
                     maxRings: Int = 3): (DataFrame, Seq[Long], Long) = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.S2

    def withDist(df: DataFrame): DataFrame = df.withColumn("dist_rad",
      S2.distance(col("q_lat"), col("q_lng"), col(latCol), col(lngCol)))

    val q = queries.select(col("query_id"), col("q_lat"), col("q_lng"))
    val caches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val parts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val leftoverCounts = scala.collection.mutable.ArrayBuffer[Long]()

    var angle = Earth.angleFromMeters(initialRadiusMeters)
    var leftover = q
    var nLeftover = -1L // lazily counted; -1 = not yet known non-zero
    var ring = 0
    while (ring < maxRings && nLeftover != 0L &&
        angle <= Metric.MinWidth.value(0)) {
      val level = Metric.MinWidth.maxLevel(angle)
      val qCells = leftover
        .withColumn("q_cell", S2.parent(S2.cellId(col("q_lat"), col("q_lng")), lit(level)))
        .withColumn("cell", explode(array_union(
          S2.neighbors(col("q_cell"), lit(level)), array(col("q_cell")))))
        .drop("q_cell")
      val pCells = points.withColumn("cell",
        S2.parent(S2.cellId(col(latCol), col(lngCol)), lit(level)))

      // The ring candidate set (points within r_r of a leftover query) is
      // the join's working set — orders of magnitude smaller than the
      // points table. Persisting it means every consumer (satisfied
      // count, escalation check, output) reads one scan's work.
      // DISK_ONLY: candidate blocks must never compete with execution
      // memory (storage-pool pressure starves concurrent sorts).
      val candidates = withDist(pCells.join(qCells, "cell"))
        .filter(col("dist_rad") <= lit(angle))
        .drop("cell")
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      caches += candidates

      val satisfiedIds = candidates.groupBy("query_id")
        .agg(count(lit(1)).as("n_cand"))
        .filter(col("n_cand") >= k)
        .select("query_id")
      parts += candidates.join(broadcast(satisfiedIds), "query_id")
      leftover = leftover.join(satisfiedIds, Seq("query_id"), "left_anti")
      // escalation check: a count on the query table (small by contract)
      nLeftover = leftover.count()
      leftoverCounts += nLeftover
      angle *= 4
      ring += 1
    }

    // Initial radius past any ring's coverage guarantee, or rings
    // exhausted with queries still unsatisfied: guaranteed-correct brute.
    val bruteQueries =
      if (nLeftover >= 0L) nLeftover else leftover.count()
    if (bruteQueries > 0L || parts.isEmpty)
      parts += withDist(points.crossJoin(broadcast(leftover)))

    val acc = parts.reduce(_ unionByName _)
    val order =
      if (tieBreakCol == null) Seq(col("dist_rad").asc)
      else Seq(col("dist_rad").asc, col(tieBreakCol).asc)
    val w = Window.partitionBy("query_id").orderBy(order: _*)
    val topK = acc.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
    SpatialJoin.retireKnnCaches(caches.toSeq)
    (topK, leftoverCounts.toSeq, bruteQueries)
  }

  // Deferred cleanup for knnJoinDF's DISK_ONLY ring caches: the current
  // call's caches must stay alive until its lazy result is consumed, so
  // each call retires the PREVIOUS call's blocks instead. Storage is
  // bounded at one call's ring set per session regardless of how many
  // kNN joins run (r2 leaked one block set per call).
  private var lastKnnCaches: Seq[DataFrame] = Nil
  private def retireKnnCaches(current: Seq[DataFrame]): Unit = synchronized {
    // CacheManager dedupes by logical plan: a plan-identical repeat call
    // SHARES the previous cache entry, and unpersisting the old handle
    // would evict the entry the new result is about to read.
    lastKnnCaches.foreach { old =>
      // the previous caches may belong to a SparkContext that has since
      // stopped (test suites recreate sessions); unpersisting a dead
      // handle NPEs inside the block manager, and there is nothing to
      // free there anyway
      if (!old.sparkSession.sparkContext.isStopped &&
          !current.exists(c => old.queryExecution.analyzed.sameResult(
            c.queryExecution.analyzed)))
        try old.unpersist(false) catch { case _: Exception => }
    }
    lastKnnCaches = current
  }
}
