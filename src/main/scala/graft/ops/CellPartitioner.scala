package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Skew-aware spatial partitioning.
  *
  * Web-scale geodata is pathologically skewed (80%+ of pages in a few
  * urban cells). Hash-partitioning by a fixed-level cell key sends whole
  * cities to single tasks. This operator:
  *
  *  1. Samples a cell histogram at a coarse level.
  *  2. Adaptively refines hot cells into children until every refined
  *     cell is under the target fraction (the Spark-side analogue of the
  *     reference ShapeIndex's subdivide-while-too-many-edges rule,
  *     shapeindex.go:634-637).
  *  3. Salts any *leaf-hot* cells that cannot be split further.
  *  4. Repartitions by the refined key, yielding balanced partitions that
  *     are still Hilbert-contiguous (range-friendly for downstream merge
  *     joins and Iceberg write clustering).
  *
  * The histogram is O(distinct coarse cells) on the driver — thousands of
  * entries even at planet scale — and the refined boundaries are a
  * broadcastable sorted array, so the plan stays a single exchange.
  */
object CellPartitioner {

  /** Refined partitioning spec: sorted cell ids (unsigned) whose ranges
    * tile the sampled data; hot leaf cells carry extra salt fan-out.
    */
  final case class SpatialPartitioning(cells: Array[Long], salts: Array[Int]) {
    def numBuckets: Int = salts.sum
    /** Bucket of a leaf cell + a salt source (e.g. a row hash). */
    def bucketOf(leaf: Long, saltSource: Long): Int = {
      var lo = 0
      var hi = cells.length - 1
      // rightmost cell whose rangeMin <= leaf
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (java.lang.Long.compareUnsigned(CellId.rangeMin(cells(mid)), leaf) <= 0) lo = mid
        else hi = mid - 1
      }
      var base = 0
      var i = 0
      while (i < lo) { base += salts(i); i += 1 }
      val s = salts(lo)
      if (s <= 1) base
      else base + (Math.floorMod(saltSource, s.toLong)).toInt
    }
  }

  /** Build an adaptive partitioning from a two-level histogram.
    *
    * Driver safety at planet scale: a single histogram at maxLevel=12
    * would collect one tuple per populated level-12 cell (tens of
    * millions). Instead:
    *
    *  - Pass 1 (exact, tiny): coarse histogram at coarseLevel — at most
    *    6*4^coarseLevel populated cells regardless of data size.
    *  - Pass 2 (sampled, bounded): fine histogram at maxLevel over the
    *    HOT coarse cells only, with the sample fraction auto-chosen so
    *    the expected collected size stays under maxDriverCells; sampled
    *    counts are scaled back by 1/fraction.
    *
    * On small inputs the auto fraction is 1.0, so counts stay exact.
    *
    * @param df           input with a leaf cell id column
    * @param cellCol      leaf cell column name
    * @param coarseLevel  histogram level to start from
    * @param maxLevel     refinement floor (cells are never split deeper)
    * @param targetRows   desired max rows per bucket
    * @param sampleFraction fine-pass fraction; NaN (default) = auto from
    *                     maxDriverCells
    * @param maxDriverCells bound on rows collected to the driver
    */
  def plan(df: DataFrame, cellCol: String, coarseLevel: Int = 4,
           maxLevel: Int = 12, targetRows: Long = 0L,
           sampleFraction: Double = Double.NaN,
           maxDriverCells: Int = 250000): SpatialPartitioning = {
    val spark = df.sparkSession
    // Pass 1: exact coarse histogram.
    val coarse = df
      .groupBy(graft.functions.S2.parent(col(cellCol), lit(coarseLevel)).as("c"))
      .agg(count("*").as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    val total = coarse.map(_._2).sum
    val target = if (targetRows > 0) targetRows
      else math.max(1L, total / math.max(1, spark.sparkContext.defaultParallelism * 2))

    // Pass 2: fine histogram restricted to hot coarse cells, sampled so
    // the driver collect stays bounded even when all data is urban-hot.
    val hotCoarse = coarse.filter(_._2 > target).map(_._1)
    val hotRows = coarse.filter(_._2 > target).map(_._2).sum
    val frac = if (!sampleFraction.isNaN) sampleFraction
      else math.min(1.0, maxDriverCells.toDouble / math.max(1L, hotRows))
    val fine: Array[(Long, Long)] = if (hotCoarse.isEmpty) Array.empty else {
      val hotSet = hotCoarse.toSet
      val inHot = df.filter(
        graft.functions.S2.parent(col(cellCol), lit(coarseLevel))
          .isInCollection(hotSet))
      val sampled = if (frac >= 1.0) inHot else inHot.sample(frac, 42)
      sampled
        .groupBy(graft.functions.S2.parent(col(cellCol), lit(maxLevel)).as("c"))
        .agg(count("*").as("n"))
        .collect()
        .map(r => (r.getLong(0), math.max(1L, math.round(r.getLong(1) / frac))))
    }
    // Combined mixed-level histogram: coarse entries for cold cells (never
    // refined below their own count <= target), fine entries for hot ones.
    val hotSet = hotCoarse.toSet
    val hist = coarse.filter(c => !hotSet.contains(c._1)) ++ fine

    // Sort the fine histogram once; range counts via prefix sums + binary
    // search so refinement is O(cells * log n).
    val fineSorted = hist.sortWith((a, b) =>
      java.lang.Long.compareUnsigned(a._1, b._1) < 0)
    val fineCells = fineSorted.map(_._1)
    val prefix = new Array[Long](fineCells.length + 1)
    var pi = 0
    while (pi < fineCells.length) {
      prefix(pi + 1) = prefix(pi) + fineSorted(pi)._2
      pi += 1
    }
    def lowerBound(v: Long): Int = {
      var lo = 0; var hi = fineCells.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (java.lang.Long.compareUnsigned(fineCells(mid), v) < 0) lo = mid + 1
        else hi = mid
      }
      lo
    }
    def countIn(cell: Long): Long = {
      val a = lowerBound(CellId.rangeMin(cell))
      val b = lowerBound(CellId.rangeMax(cell) + 1) // rangeMax is odd < 2^63
      prefix(b) - prefix(a)
    }

    val out = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    def refine(cell: Long): Unit = {
      val n = countIn(cell)
      if (n == 0) return
      if (n <= target || CellId.level(cell) >= maxLevel) {
        val salt = math.max(1, math.ceil(n.toDouble / target).toInt)
        out += ((cell, salt))
      } else {
        CellId.children(cell).foreach(refine)
      }
    }
    val roots = fineCells.map(c => CellId.parent(c, coarseLevel)).distinct
    val sortedRoots = roots.sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0)
    sortedRoots.foreach(refine)

    val sorted = out.sortWith((a, b) =>
      java.lang.Long.compareUnsigned(a._1, b._1) < 0)
    SpatialPartitioning(sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }

  /** Repartition df by the adaptive spatial plan: one `bucket` column +
    * one hash exchange on it. Hot cells spread over their salt fan-out;
    * everything else stays Hilbert-contiguous.
    */
  def repartitionByPlan(df: DataFrame, cellCol: String, saltCol: String,
                        partitioning: SpatialPartitioning): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(partitioning)
    val bucketUdf = udf((leaf: Long, salt: Long) => bc.value.bucketOf(leaf, salt))
    df.withColumn("bucket", bucketUdf(col(cellCol), col(saltCol)))
      .repartition(math.max(1, partitioning.numBuckets), col("bucket"))
  }

  /** Convenience: plan + repartition in one call. */
  def repartitionSpatially(df: DataFrame, cellCol: String, saltCol: String,
                           coarseLevel: Int = 4, maxLevel: Int = 12): DataFrame = {
    val p = plan(df, cellCol, coarseLevel, maxLevel)
    repartitionByPlan(df, cellCol, saltCol, p)
  }
}
