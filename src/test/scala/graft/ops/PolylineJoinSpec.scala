package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Polyline radius join vs brute-force ground truth, and the kNN join's
  * DataFrame query side with its two-scan plan audit.
  */
class PolylineJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("polyline-join-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rng = new scala.util.Random(2468)

  private def randChain(centerLat: Double, centerLng: Double, n: Int): Polyline = {
    var lat = centerLat + rng.nextDouble()
    var lng = centerLng + rng.nextDouble()
    val pts = Seq.fill(n) {
      lat += (rng.nextDouble() - 0.5) * 0.3
      lng += (rng.nextDouble() - 0.5) * 0.3
      (lat, lng)
    }
    Polyline.fromLatLngsDegrees(pts)
  }

  test("polyline radius join equals brute-force pairs") {
    val linesA = (0L until 30L).map(i => (i, randChain(40, -74, 4)))
    val linesB = (0L until 40L).map(i => (i, randChain(40.2, -73.8, 3)))
    val radiusMeters = 25000.0
    val radiusRad = Earth.angleFromMeters(radiusMeters)

    val got = PolylineJoin.polylineRadiusJoin(spark, linesA, linesB, radiusMeters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val want = (for {
      (ai, a) <- linesA
      (bi, b) <- linesB
      if ChordAngle.toRadians(a.distanceToPolyline(b)) <= radiusRad
    } yield (ai, bi)).toSet

    assert(want.nonEmpty, "fixture should produce some close pairs")
    assert(got === want)
  }

  test("kNN DataFrame query side matches the Seq API and scans points at most twice") {
    import spark.implicits._
    val pages = graft.sources.PagesSource.withLatLng(
      spark.read.parquet(
        graft.sources.PagesSource.pagesParquet(spark, "/root/testdata/sf0.001")))
    val qSeq = graft.sources.PagesSource.cities.zipWithIndex.map {
      case ((la, ln), i) => (i.toLong, la, ln)
    }
    val fromSeq = SpatialJoin.knnJoin(spark, pages, qSeq, k = 3, tieBreakCol = "url")
      .select("query_id", "url").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val qDf = qSeq.toDF("query_id", "q_lat", "q_lng")
    val df = SpatialJoin.knnJoinDF(spark, pages, qDf, k = 3, tieBreakCol = "url")
    val fromDf = df.select("query_id", "url").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fromSeq === fromDf)
    assert(fromDf.size === 8 * 3)

    // Plan audit: the points parquet appears in at most 2 executed file
    // scans (grid cache fill + brute pass); other consumers read cache.
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive._
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    var fileScans = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: FileSourceScanExec => fileScans += 1
      case _: InMemoryTableScanExec => () // cache reads don't rescan files
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    assert(fileScans <= 2, s"points scanned $fileScans times")
  }
}
