package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ring-escalation kNN (VERDICT r4 "Next" #5): sparse-region queries must
  * escalate through expanding cell rings (4x radius per ring) and only
  * pay the full broadcast scan when the rings are exhausted. Pinned here:
  * the brute-fallback query count drops from 4 to 1 when escalation is
  * enabled, and the returned top-k is IDENTICAL across maxRings=0 (brute
  * everything), 1 (the r4 behavior) and 3 — escalation is a pure access-
  * path change.
  */
class KnnRingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("knn-ring-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // Dense cluster near New York (ring-0 queries), a 5-point cluster in the
  // mid-Pacific ~300 km from its queries (reachable at ring 1 = 400 km),
  // and nothing within 1600 km of the southern-ocean query (ring-proof).
  private lazy val points = {
    import spark.implicits._
    val nyc = (0 until 300).map { i =>
      (s"nyc_$i", 40.70 + (i % 20) * 0.01, -74.00 + (i / 20) * 0.01)
    }
    val pacific = (0 until 5).map { j =>
      (s"pac_$j", 2.6 + j * 0.05, -140.0)
    }
    (nyc ++ pacific).toDF("url", "lat", "lng")
  }

  private lazy val queriesDf = {
    import spark.implicits._
    Seq(
      (0L, 40.71, -74.0), (1L, 40.72, -74.0), (2L, 40.73, -74.0), // ring 0
      (3L, 0.0, -140.0), (4L, 0.1, -140.0), (5L, 0.2, -140.0),    // ring 1
      (6L, -60.0, -140.0)                                          // brute
    ).toDF("query_id", "q_lat", "q_lng")
  }

  private def run(maxRings: Int) =
    SpatialJoin.knnJoinDFStats(spark, points, queriesDf, k = 3,
      tieBreakCol = "url", maxRings = maxRings)

  private def keyed(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "url", "knn_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet

  test("sparse-region queries satisfy via ring escalation, not brute") {
    val (df1, leftovers1, brute1) = run(1)
    val (df3, leftovers3, brute3) = run(3)
    // r4 behavior: everything the first 100 km ring misses went brute
    assert(leftovers1 == Seq(4L) && brute1 == 4L,
      s"maxRings=1: leftovers=$leftovers1 brute=$brute1")
    // escalation: the 3 Pacific queries satisfy at ring 1 (400 km); only
    // the southern-ocean query (nothing within 1600 km) pays the scan
    assert(leftovers3 == Seq(4L, 1L, 1L) && brute3 == 1L,
      s"maxRings=3: leftovers=$leftovers3 brute=$brute3")
    assert(keyed(df1) == keyed(df3), "escalation changed the result")
  }

  test("ring results equal the brute-force reference") {
    val (bruteAll, leftovers0, brute0) = run(0)
    assert(leftovers0.isEmpty && brute0 == 7L)
    assert(keyed(run(3)._1) == keyed(bruteAll))
    // every query got exactly k rows
    val perQuery = run(3)._1.groupBy("query_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L to 6L).forall(perQuery(_) == 3L))
  }
}
