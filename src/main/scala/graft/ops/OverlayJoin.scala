package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Polygon x polygon overlay join: which regions of set A contain /
  * intersect which regions of set B — the distributed surface over
  * Loop/Polygon Contains+Intersects (/root/reference/s2/loop.go:274-369,
  * polygon.go:826-892).
  *
  * Plan shape (scales to millions of polygons per side):
  *  1. Each polygon's covering is denormalized to a common join level and
  *     becomes rows of a cell-keyed dimension table — same currency as
  *     the PIP shuffle join (ShuffleSpatialJoin.polygonDimTable).
  *  2. Equi-join on the cell key yields candidate pairs: two polygons can
  *     only relate if some covering cell overlaps. One shuffle, keyed by
  *     cell; hot cells are AQE-splittable.
  *  3. Candidate pairs are dedup'd on ids (narrow) and refined with the
  *     exact relation predicates against broadcast geometry.
  *
  * For broadcast-scale fixture sets the same plan degenerates gracefully
  * (tiny dim tables, broadcast hash join) — the shape is what matters at
  * 100 TB.
  */
object OverlayJoin {

  /** Covering dim table rows (cell_lk, id) for a polygon set. */
  private def coveringCells(polys: Seq[(Long, Polygon)], level: Int,
                            coverer: RegionCoverer): Seq[(Long, Long)] =
    polys.flatMap { case (id, p) =>
      coverer.covering(p).denormalize(level, 1).ids
        .map(c => (CellId.parent(c, level), id)).distinct
    }

  /** Inner overlap join of two polygon sets.
    *
    * @return DataFrame(a_id, b_id, a_contains_b, b_contains_a) with one
    *         row per intersecting pair.
    */
  def polygonOverlapJoin(spark: SparkSession,
                         polysA: Seq[(Long, Polygon)],
                         polysB: Seq[(Long, Polygon)],
                         level: Int = 8,
                         maxCells: Int = 32): DataFrame = {
    import spark.implicits._
    val coverer = RegionCoverer(maxCells = maxCells)
    val aCells = coveringCells(polysA, level, coverer).toDF("cell", "a_id")
    val bCells = coveringCells(polysB, level, coverer).toDF("cell", "b_id")

    val candidates = aCells.join(bCells, "cell")
      .select("a_id", "b_id").distinct()

    val aMap = spark.sparkContext.broadcast(polysA.toMap)
    val bMap = spark.sparkContext.broadcast(polysB.toMap)
    val relUdf = udf((aId: Long, bId: Long) => {
      val a = aMap.value(aId)
      val b = bMap.value(bId)
      if (!a.intersects(b)) null
      else (a.contains(b), b.contains(a))
    })

    candidates
      .withColumn("rel", relUdf(col("a_id"), col("b_id")))
      .filter(col("rel").isNotNull)
      .select(col("a_id"), col("b_id"),
        col("rel._1").as("a_contains_b"), col("rel._2").as("b_contains_a"))
  }

  /** Shuffle-native overlay join for polygon sets too large to broadcast:
    * both sides are DataFrames of (id, geom) with wire-encoded polygons
    * (Codec.encodePolygon). Coverings are computed row-side from the
    * geometry, candidates pair on covering cells, and the refine decodes
    * through a content-keyed executor cache — geometry only travels on
    * the candidate pairs that survive cell pruning, never on covering
    * rows.
    */
  def polygonOverlapJoinLarge(spark: SparkSession,
                              polysA: DataFrame, polysB: DataFrame,
                              level: Int = 8,
                              maxCells: Int = 32): DataFrame = {
    val coverUdf = udf((geom: Array[Byte]) => {
      val p = Codec.decodePolygon(geom)
      RegionCoverer(maxCells = maxCells).covering(p)
        .denormalize(level, 1).ids.map(c => CellId.parent(c, level)).distinct
    })
    val aCells = polysA
      .withColumn("cell", explode(coverUdf(col("geom"))))
      .select(col("cell"), col("a_id"))
    val bCells = polysB
      .withColumn("cell", explode(coverUdf(col("geom"))))
      .select(col("cell"), col("b_id"))
    val candidates = aCells.join(bCells, "cell")
      .select("a_id", "b_id").distinct()

    val relUdf = udf((aGeom: Array[Byte], bGeom: Array[Byte]) => {
      val a = OverlayJoin.cachedPolygon(aGeom)
      val b = OverlayJoin.cachedPolygon(bGeom)
      if (!a.intersects(b)) null
      else (a.contains(b), b.contains(a))
    })
    candidates
      .join(polysA.select(col("a_id"), col("geom").as("a_geom")), "a_id")
      .join(polysB.select(col("b_id"), col("geom").as("b_geom")), "b_id")
      .withColumn("rel", relUdf(col("a_geom"), col("b_geom")))
      .filter(col("rel").isNotNull)
      .select(col("a_id"), col("b_id"),
        col("rel._1").as("a_contains_b"), col("rel._2").as("b_contains_a"))
  }

  // Executor-local decode cache keyed by geometry bytes (same pattern as
  // ShuffleSpatialJoin.cachedLoop).
  private val polyCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[java.nio.ByteBuffer, Polygon](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[java.nio.ByteBuffer, Polygon]): Boolean =
        size() > 1024
    })
  def cachedPolygon(geom: Array[Byte]): Polygon = {
    val key = java.nio.ByteBuffer.wrap(geom)
    var p = polyCache.get(key)
    if (p == null) {
      p = Codec.decodePolygon(geom)
      polyCache.put(key, p)
    }
    p
  }
}
