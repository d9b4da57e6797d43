package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hilbert-clustered writes: files must cover disjoint cell ranges and
  * range scans must touch only the covering files (the data-skipping
  * contract of Iceberg write.order-by, demonstrated on parquet).
  */
class CellClusteredWriteSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("clustered-write-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("clustered files cover disjoint Hilbert ranges; range scans skip files") {
    val pages = graft.sources.PagesSource.withLatLng(
      spark.read.parquet(
        graft.sources.PagesSource.pagesParquet(spark, "/root/testdata/sf0.001")))
      .withColumn("cell_id",
        graft.functions.S2.cellId(col("lat"), col("lng")))

    val dir = java.nio.file.Files.createTempDirectory("graft_clustered").toString
    CellClusteredWrite.writeClustered(pages, "cell_id", dir, numFiles = 8)

    // Per-file (min, max) of the sort key must be pairwise disjoint.
    val back = spark.read.parquet(dir)
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("cell_sort").as("lo"), max("cell_sort").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length >= 4, s"expected several files, got ${ranges.length}")
    for (i <- 1 until ranges.length) {
      assert(ranges(i)._1 > ranges(i - 1)._2,
        s"file ranges overlap: ${ranges(i - 1)} vs ${ranges(i)}")
    }

    // A tight cell-range scan touches few files: query one city's level-8
    // cell range.
    val city = graft.core.CellId.parent(
      graft.core.CellId.fromLatLngDegrees(48.8566, 2.3522), 8)
    val lo = graft.core.CellId.rangeMin(city)
    val hi = graft.core.CellId.rangeMax(city)
    val hit = back.filter(CellClusteredWrite.cellRangePredicate(lo, hi))
    val nRows = hit.count()
    assert(nRows > 0, "Paris cell range should match fixture rows")
    val filesTouched = hit.select(input_file_name()).distinct().count()
    assert(filesTouched <= 2,
      s"clustered range scan touched $filesTouched of ${ranges.length} files")
  }

  test("region union: coverings and containment over disjoint members") {
    import graft.core._
    val capA = Cap.fromCenterRadians(
      LatLng.toPointDegrees(40.7, -74.0), Earth.angleFromMeters(50000))
    val capB = Cap.fromCenterRadians(
      LatLng.toPointDegrees(48.86, 2.35), Earth.angleFromMeters(50000))
    val u = RegionUnion(Seq(capA, capB))
    assert(u.containsPoint(LatLng.toPointDegrees(40.7, -74.0)))
    assert(u.containsPoint(LatLng.toPointDegrees(48.86, 2.35)))
    assert(!u.containsPoint(LatLng.toPointDegrees(0.0, 0.0)))
    val cov = RegionCoverer(maxCells = 16).covering(u)
    // the covering must contain both members' centers
    assert(cov.containsCellId(CellId.fromLatLngDegrees(40.7, -74.0)))
    assert(cov.containsCellId(CellId.fromLatLngDegrees(48.86, 2.35)))
  }

  test("id-set lexicon: dedup, implicit singletons, round trips") {
    import graft.core._
    val lex = new IdSetLexicon
    assert(lex.add(Seq.empty) === lex.EmptySetId)
    assert(lex.add(Seq(7)) === 7)
    val a = lex.add(Seq(3, 1, 2, 3))
    assert(lex.idSet(a) === Seq(1, 2, 3))
    assert(lex.add(Seq(1, 2, 3)) === a, "duplicate sets share an id")
    val b = lex.add(Seq(4, 5))
    assert(b !== a)
    assert(lex.idSet(b) === Seq(4, 5))
    assert(lex.idSet(lex.EmptySetId) === Seq.empty)
    assert(lex.idSet(9) === Seq(9))
  }
}
