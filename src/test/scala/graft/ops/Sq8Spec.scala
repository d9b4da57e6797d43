package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar quantization: exact code arithmetic, zero-vector guard,
  * aggregate-vs-window equivalence at multiple parallelism levels, and
  * measured recall of the quantized ordering vs the float brute force.
  */
class Sq8Spec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("sq8-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def refCodes(v: Array[Float]): Array[Int] = {
    var maxabs = 0.0
    v.foreach(x => maxabs = math.max(maxabs, math.abs(x.toDouble)))
    if (maxabs == 0.0) Array.fill(v.length)(0)
    else v.map(x => math.floor(x.toDouble * 127.0 / maxabs).toInt)
  }

  private def randVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat)))
  }

  test("codes match the scalar reference exactly; bounds hold") {
    import spark.implicits._
    val vecs = randVecs(200, 16, seed = 3)
    val got = Similarity.withSq8Codes(vecs.toDF("vec_id", "embedding"),
        "embedding", "codes")
      .select(col("vec_id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    vecs.foreach { case (id, v) =>
      assert(java.util.Arrays.equals(got(id), refCodes(v)), s"vec $id")
      assert(got(id).forall(c => c >= -128 && c <= 127))
    }
  }

  test("zero vector quantizes to all-zero codes (no div-by-zero)") {
    import spark.implicits._
    val df = Seq((0L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val codes = Similarity.withSq8Codes(df, "embedding", "codes")
      .select(col("codes")).head.getSeq[Int](0)
    assert(codes.forall(_ == 0) && codes.length == 8)
  }

  test("sq8TopK equals the window reference at parallelism 1 and 9") {
    import spark.implicits._
    val corpus = randVecs(300, 24, seed = 8)
    val queries = corpus.take(6)
      .map { case (id, v) => (id, v) }

    // driver-side reference: integer code dots rescaled by the corpus
    // vector's stored factor (maxabs/127), then a full sort
    val codes = corpus.map { case (id, v) => id -> refCodes(v) }.toMap
    val scales = corpus.map { case (id, v) =>
      id -> v.map(x => math.abs(x.toDouble)).max / 127.0
    }.toMap
    def dot(a: Array[Int], b: Array[Int]): Long =
      a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
    val want = (for {
      (qid, _) <- queries
      ranked = corpus.filter(_._1 != qid)
        .map { case (cid, _) =>
          (cid, dot(codes(qid), codes(cid)).toDouble * scales(cid))
        }
        .sortBy { case (cid, d) => (-d, cid) }.take(3).zipWithIndex
      ((cid, _), pos) <- ranked
    } yield (qid, cid, pos + 1L)).toSet

    for (parts <- Seq(1, 9)) {
      val c = corpus.toDF("vec_id", "embedding").repartition(parts)
      val q = queries.toDF("q_id", "q_vec")
      val got = Similarity.sq8TopK(c, q, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"parallelism $parts")
    }
  }

  /** Clustered unit vectors: 40 bases x 10 perturbed members. Real
    * embedding corpora have structure — a query's true neighbors sit at
    * a meaningful similarity gap above the background. (On UNSTRUCTURED
    * Gaussian data the top-3 among 400 are near-ties separated by less
    * than the quantization step, so recall there measures tie-flipping,
    * not candidate quality.)
    */
  private def clusteredUnitVecs(seed: Long): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val bases = Seq.fill(40)(Array.fill(64)(rng.nextGaussian()))
    for {
      (b, ci) <- bases.zipWithIndex
      m <- 0 until 10
    } yield ((ci * 10 + m).toLong,
      unit(b.map(x => x + rng.nextGaussian() * 0.15)))
  }

  test("ivfSq8TopK results are a subset-consistent composition: every " +
    "returned candidate shares a probed list, and scores order as sq8") {
    import spark.implicits._
    val corpus = clusteredUnitVecs(seed = 33)
    val cDf = corpus.toDF("vec_id", "embedding")
    val qDf = corpus.filter(_._1 % 40 == 0).take(8).toDF("q_id", "q_vec")
    val full = Similarity.sq8TopK(cDf, qDf, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfSq8TopK(spark, cDf, qDf, k = 3,
        nCentroids = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // probing ALL lists makes IVF+SQ8 equal the full SQ8 scan exactly
    assert(ivf.map(t => (t._1, t._2)).toSet == full)
    // and with fewer probes it returns k rows per query from the lists
    val pruned = Similarity.ivfSq8TopK(spark, cDf, qDf, k = 3,
        nCentroids = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (full & pruned).size.toDouble / full.size
    assert(recall >= 0.5, s"pruned-probe recall was $recall")
  }

  test("on a clustered unit-vector corpus (the cosine-ANN deployment: " +
    "normalize, then quantize) recall@3 vs float cosine brute force") {
    import spark.implicits._
    val corpus = clusteredUnitVecs(seed = 21)
    val cDf = corpus.toDF("vec_id", "embedding")
    val qDf = corpus.filter(_._1 % 40 == 0).take(10).toDF("q_id", "q_vec")
    val exact = Similarity.bruteForceTopK(cDf, qDf, k = 3)
      .select(col("q_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = Similarity.sq8TopK(cDf, qDf, k = 3)
      .select(col("q_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & sq8).size.toDouble / exact.size
    assert(recall >= 0.85, s"recall@3 was $recall")
  }
}
