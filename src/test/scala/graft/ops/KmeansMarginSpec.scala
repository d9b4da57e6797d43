package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the STABILITY of the q_ann_ivf_kmeans gate (ADVICE r4 #3): the
  * Spark side computes Lloyd centroids as (sum/n).toFloat from a Spark
  * double aggregate while the DuckDB oracle computes sum(...)/count(*)
  * cast REAL — identical arithmetic shape, but double-summation ORDER can
  * still differ, so a centroid dimension may land 1 float-ulp apart. A
  * 1-ulp centroid wiggle moves any cosine by ~1e-15; if every argmax /
  * probe decision on the fixture has a margin orders of magnitude above
  * that, the wiggle can never flip a decision and the gate is stable by
  * measurement, not assumption. Asserted for every decision the gate
  * depends on, at every Lloyd iteration: per-vector argmax assignment
  * (iters 0, 1, 2) and the per-query nProbe=4 probe boundary (iter 2).
  */
class KmeansMarginSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("kmeans-margin-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"
  private val MinMargin = 1e-7 // ~8 orders above 1-ulp cosine noise

  private lazy val corpus: Array[(Long, Array[Float])] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  }

  /** Sims of v to every centroid, ordered by (sim desc, centroid asc) —
    * the engine's and the oracle's shared tie-break.
    */
  private def ranked(v: Array[Float], cents: Array[Array[Float]]) =
    cents.zipWithIndex.map { case (c, i) => (cosine(v, c), i) }
      .sortBy { case (s, i) => (-s, i) }

  private def minAssignMargin(cents: Array[Array[Float]]): Double =
    corpus.iterator.map { case (_, v) =>
      val r = ranked(v, cents)
      r(0)._1 - r(1)._1
    }.min

  test("every argmax and probe decision has margin >> 1-ulp centroid noise") {
    val cents0 = corpus.take(16).map(_._2) // deterministic lowest-id seed
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents1 = Similarity.kmeansCentroids(spark, df, 16, 1)
    val cents2 = Similarity.kmeansCentroids(spark, df, 16, 2)
    val m0 = minAssignMargin(cents0)
    val m1 = minAssignMargin(cents1)
    val m2 = minAssignMargin(cents2)
    // probe boundary: rank-4 vs rank-5 centroid sim for the 16 queries
    val mProbe = corpus.take(16).iterator.map { case (_, v) =>
      val r = ranked(v, cents2)
      r(3)._1 - r(4)._1
    }.min
    info(f"assignment margins: iter0 $m0%.3e iter1 $m1%.3e iter2 $m2%.3e; probe $mProbe%.3e")
    assert(m0 > MinMargin, f"iter-0 argmax margin $m0%.3e too tight")
    assert(m1 > MinMargin, f"iter-1 argmax margin $m1%.3e too tight")
    assert(m2 > MinMargin, f"iter-2 argmax margin $m2%.3e too tight")
    assert(mProbe > MinMargin, f"probe boundary margin $mProbe%.3e too tight")
  }
}
