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

  test("degenerate inputs: empty sides, tiny k-overflow, single chains") {
    import spark.implicits._
    val one = Seq((0L, Polyline.fromLatLngsDegrees(Seq((10.0, 10.0), (10.5, 10.5)))))
    // empty B side -> empty result, no crash
    val emptyB = Seq.empty[(Long, Polyline)]
    assert(PolylineJoin.polylineRadiusJoin(spark, one, emptyB, 50000).count() === 0)
    assert(PolylineJoin.polylineRadiusJoin(spark, emptyB, one, 50000).count() === 0)
    // self-join of a single chain finds itself at distance 0
    val self = PolylineJoin.polylineRadiusJoin(spark, one, one, 1000).collect()
    assert(self.length === 1 && self(0).getDouble(2) === 0.0)

    // kNN with k greater than the candidate count returns all points
    val pages = graft.sources.PagesSource.withLatLng(
      spark.read.parquet(
        graft.sources.PagesSource.pagesParquet(spark, "/root/testdata/sf0.001")))
    val total = pages.count()
    val qDf = Seq((0L, 48.8566, 2.3522)).toDF("query_id", "q_lat", "q_lng")
    val all = SpatialJoin.knnJoinDF(spark, pages, qDf, k = total.toInt + 10,
      tieBreakCol = "url")
    assert(all.count() === total)

    // overlay join with an empty side
    val aDf = Seq((0L, graft.core.Codec.encodePolygon(
      graft.SparkEntry.overlayPolysA.head._2))).toDF("a_id", "geom")
    val bDf = spark.emptyDataset[(Long, Array[Byte])].toDF("b_id", "geom")
    assert(OverlayJoin.polygonOverlapJoinLarge(spark, aDf, bDf).count() === 0)

    // ClosestEdgeQuery over an empty index
    val emptyIndex = new graft.core.ShapeIndex()
    val q = new graft.core.ClosestEdgeQuery(emptyIndex)
    assert(q.findClosestEdges(graft.core.ClosestEdgeQuery.PointTarget(
      LatLng.toPointDegrees(0, 0)), 3).isEmpty)
  }

  test("kNN join matches exact ground truth across radii, k, and densities") {
    import spark.implicits._
    // clustered + sparse points: some queries satisfied by the grid pass,
    // others forced through the brute fallback
    val pts = ((0 until 400).map { i =>
      (s"p$i", 40.0 + rng.nextDouble() * 2, -74.5 + rng.nextDouble() * 2)
    } ++ (0 until 20).map { i =>
      (s"sparse$i", -20.0 + rng.nextDouble() * 40, 60.0 + rng.nextDouble() * 40)
    }).toDF("url", "lat", "lng")
    for (trial <- 0 until 4) {
      val k = 1 + rng.nextInt(7)
      val radius = Seq(5000.0, 50000.0, 400000.0, 3000000.0)(trial)
      val queries = ((0 until 6).map(i =>
        (i.toLong, 40.5 + rng.nextDouble(), -74.0 + rng.nextDouble())) ++
        Seq((6L, -10.0, 70.0), (7L, 89.0, 0.0))) // sparse + polar queries
      val got = SpatialJoin.knnJoinDF(spark, pts,
          queries.toDF("query_id", "q_lat", "q_lng"), k,
          initialRadiusMeters = radius, tieBreakCol = "url")
        .select("query_id", "url").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      // exact ground truth via haversine in Scala
      val rows = pts.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      val want = queries.flatMap { case (qid, qla, qln) =>
        rows.sortBy { case (u, la, ln) =>
          (graft.functions.LatLngStatics.distanceDegrees(qla, qln, la, ln), u)
        }.take(k).map(t => (qid, t._1))
      }.toSet
      assert(got === want, s"trial $trial k=$k radius=$radius")
    }
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
