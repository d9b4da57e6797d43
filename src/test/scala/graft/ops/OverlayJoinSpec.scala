package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Codec

/** The shuffle-native overlay join must produce exactly the broadcast
  * path's rows (same logical semantics, different physical strategy).
  */
class OverlayJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("overlay-join-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("shuffle path equals broadcast path on the overlay fixtures") {
    import spark.implicits._
    val pa = graft.SparkEntry.overlayPolysA
    val pb = graft.SparkEntry.overlayPolysB

    val broadcastRows = OverlayJoin.polygonOverlapJoin(spark, pa, pb)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
      .toSet

    val aDf = pa.map { case (id, p) => (id, Codec.encodePolygon(p)) }
      .toDF("a_id", "geom")
    val bDf = pb.map { case (id, p) => (id, Codec.encodePolygon(p)) }
      .toDF("b_id", "geom")
    val shuffleRows = OverlayJoin.polygonOverlapJoinLarge(spark, aDf, bDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
      .toSet

    assert(broadcastRows.nonEmpty)
    assert(shuffleRows === broadcastRows)

    // covering rows must not carry geometry (the r1 dim-table lesson)
    val plan = OverlayJoin.polygonOverlapJoinLarge(spark, aDf, bDf)
      .queryExecution.executedPlan.toString
    assert(!plan.linesIterator.exists(l =>
      l.contains("Exchange") && l.contains("geom") && l.contains("cell")),
      "no exchange may carry (cell, geom) rows")
  }

  test("annulus polygons round trip through the wire format in the join") {
    import spark.implicits._
    // multi-loop polygons (holes) through encode -> shuffle -> decode
    import graft.core.{Earth, LatLng, Loop, Polygon}
    val annuli = graft.SparkEntry.cityAnnuli
    val aDf = annuli.map { case (id, p) => (id, Codec.encodePolygon(p)) }
      .toDF("a_id", "geom")
    // in-ring discs (center ~133 km out, radius 30 km: spans 103-163 km,
    // inside the 80-200 km annulus) and hole-straddling discs (center
    // ~67 km, spans 37-97 km: crosses the hole boundary)
    val discs = graft.sources.PagesSource.cities.zipWithIndex.flatMap {
      case ((lat, lng), i) =>
        def disc(dLat: Double) = Polygon.fromLoops(Seq(Loop.regularLoop(
          LatLng.toPointDegrees(lat + dLat, lng),
          Earth.angleFromMeters(30000), 24)))
        Seq((i.toLong * 2, Codec.encodePolygon(disc(1.2))),
          (i.toLong * 2 + 1, Codec.encodePolygon(disc(0.6))))
    }.toDF("b_id", "geom")
    val rows = OverlayJoin.polygonOverlapJoinLarge(spark, aDf, discs)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getBoolean(2), r.getBoolean(3))))
      .toMap
    for (i <- 0 until 8) {
      // in-ring disc: contained by its own annulus
      assert(rows.get((i.toLong, i.toLong * 2)).contains((true, false)),
        s"in-ring disc of city $i should be contained")
      // straddling disc: intersects but is not contained
      assert(rows.get((i.toLong, i.toLong * 2 + 1)).contains((false, false)),
        s"straddling disc of city $i should intersect only")
    }
  }
}
