package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Polyline x polygon crossing join: which trajectories cross which
  * polygon boundaries — the distributed analogue of the reference's
  * CrossingEdgeQuery (/root/reference/s2/crossing_edge_query.go:15-60).
  *
  * Candidates come from the same broadcast covering index as the PIP join
  * (polyline covering cells vs polygon covering intervals); the refine is
  * the exact chain edge-crossing test.
  */
object CrossingJoin {

  /** Returns (line_id, poly_id, crossings) for every polyline whose chain
    * crosses the polygon boundary at least once, plus containment-only
    * overlaps flagged with crossings = 0 when `includeContained`.
    */
  def polylinePolygonJoin(spark: SparkSession,
                          polylines: Seq[(Long, Polyline)],
                          polygons: Seq[(Long, Loop)],
                          maxCells: Int = 16,
                          includeContained: Boolean = true): DataFrame = {
    import spark.implicits._
    val coverer = RegionCoverer(maxCells = maxCells)
    val polyEntries = polygons.map { case (id, loop) =>
      (id, loop, coverer.covering(loop))
    }
    val bc = spark.sparkContext.broadcast(polyEntries)

    // distribute polylines; each task tests its lines against broadcast
    // polygons whose coverings intersect the line's covering
    val lines = spark.sparkContext.parallelize(polylines, math.max(1,
      math.min(polylines.size, spark.sparkContext.defaultParallelism)))
    val rows = lines.flatMap { case (lineId, line) =>
      val lineCov = RegionCoverer(maxCells = 16).covering(line)
      bc.value.iterator.flatMap { case (polyId, loop, polyCov) =>
        if (!lineCov.intersectsUnion(polyCov)) None
        else {
          // exact crossing count of the chain against the loop boundary
          var crossings = 0
          var i = 1
          while (i < line.vertices.length) {
            val crosser = new EdgeCrosser(line.vertices(i - 1), line.vertices(i))
            var j = 0
            while (j < loop.numVertices) {
              if (crosser.crossingSignTo(loop.vertex(j), loop.vertex(j + 1))
                == EdgeCrossings.Cross) crossings += 1
              j += 1
            }
            i += 1
          }
          val contained = crossings == 0 &&
            loop.containsPoint(line.vertices(0))
          if (crossings > 0 || (includeContained && contained))
            Some((lineId, polyId, crossings))
          else None
        }
      }
    }
    rows.toDF("line_id", "poly_id", "crossings")
  }
}
