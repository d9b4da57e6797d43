package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns.
  *
  * Two paths:
  *  - bruteForceTopK: exact cosine top-k via broadcast queries + window —
  *    the correctness baseline, O(corpus x queries).
  *  - hyperplaneLshTopK: random-hyperplane signed LSH. Corpus is bucketed
  *    by signature band; queries probe their buckets only, then re-rank
  *    exactly within candidates. The scale path: the corpus side is a
  *    groupBy(bucket) shuffle done once, query fan-out is
  *    O(bands x bucket size) per query instead of O(corpus).
  */
object Similarity extends Serializable {

  /** Exact top-k by cosine: broadcast the (small) query set against the
    * corpus, re-rank with a per-query window. Ties broken by corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("cosine", Dedup.cosineCol(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(queryId)
      .orderBy(col("cosine").desc, col(corpusId).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rank"))
  }

  /** Deterministic random hyperplanes: nBits x dim doubles seeded. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign signature of a vector under the hyperplanes, packed to a Long
    * per 64 bits (here nBits <= 64 -> one Long).
    */
  def signature(vec: Array[Float], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var dot = 0.0
      var i = 0
      while (i < p.length && i < vec.length) { dot += p(i) * vec(i); i += 1 }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Lloyd refinement of the deterministic lowest-id quantizer: assign
    * the corpus to its nearest centroid (one distributed pass), recompute
    * each centroid as the member mean per dimension (posexplode +
    * groupBy(centroid, dim) — a bounded nCentroids x dim aggregate, never
    * a per-centroid collect), repeat. Empty clusters keep their previous
    * centroid. Deterministic up to float-summation order, which a recall
    * threshold is insensitive to.
    */
  def kmeansCentroids(spark: SparkSession, corpus: DataFrame,
                      nCentroids: Int, iters: Int,
                      corpusId: String = "vec_id",
                      corpusVec: String = "embedding"): Array[Array[Float]] = {
    var cents = corpus
      .select(col(corpusId), col(corpusVec))
      .orderBy(col(corpusId))
      .limit(nCentroids)
      .collect()
      .map(r => r.getSeq[Float](1).toArray)
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val assignUdf = udf((v: Seq[Float]) => {
        val vec = v.toArray
        var best = 0
        var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < bc.value.length) {
          val s = cosineArr(vec, bc.value(c))
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        best
      })
      val sums = corpus
        .withColumn("centroid", assignUdf(col(corpusVec)))
        .select(col("centroid"), posexplode(col(corpusVec)).as(Seq("dim", "v")))
        .groupBy("centroid", "dim")
        .agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        val c = r.getInt(0)
        next(c)(r.getInt(1)) = (r.getDouble(2) / r.getLong(3)).toFloat
      }
      cents = next
    }
    cents
  }

  private def cosineArr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  }

  /** IVF (inverted-file) ANN: a coarse quantizer partitions the corpus
    * into nCentroids inverted lists (one shuffle keyed by centroid);
    * each query probes its nProbe nearest centroids and re-ranks exactly
    * inside those lists — candidate work is O(corpus * nProbe /
    * nCentroids) per query instead of O(corpus).
    *
    * The base quantizer is deterministic (the nCentroids lowest-id
    * corpus vectors; the shape the SQL oracle mirrors).
    * kmeansIters > 0 runs that many Lloyd refinements over the corpus
    * first — tighter recall for the cost of kmeansIters extra
    * distributed passes; plan shape is unchanged.
    */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
              k: Int, nCentroids: Int = 16, nProbe: Int = 4,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "q_id", queryVec: String = "q_vec",
              kmeansIters: Int = 0): DataFrame = {
    val centroids =
      if (kmeansIters > 0)
        kmeansCentroids(spark, corpus, nCentroids, kmeansIters, corpusId, corpusVec)
      else corpus
        .select(col(corpusId), col(corpusVec))
        .orderBy(col(corpusId))
        .limit(nCentroids)
        .collect()
        .map(r => r.getSeq[Float](1).toArray)
    val bc = spark.sparkContext.broadcast(centroids)

    def cosine(a: Array[Float], b: Array[Float]): Double = cosineArr(a, b)

    val assignUdf = udf((v: Seq[Float]) => {
      val vec = v.toArray
      var best = 0
      var bestSim = Double.NegativeInfinity
      var c = 0
      while (c < bc.value.length) {
        val s = cosine(vec, bc.value(c))
        if (s > bestSim) { bestSim = s; best = c }
        c += 1
      }
      best
    })
    val probeUdf = udf((v: Seq[Float]) => {
      val vec = v.toArray
      bc.value.indices.map(c => (c, cosine(vec, bc.value(c))))
        .sortBy(-_._2).take(nProbe).map(_._1)
    })

    val lists = corpus.withColumn("centroid", assignUdf(col(corpusVec)))
      .select(col("centroid"), col(corpusId), col(corpusVec))
    val probes = queries.withColumn("centroid", explode(probeUdf(col(queryVec))))
      .select(col("centroid"), col(queryId), col(queryVec))

    val candidates = probes.join(lists, "centroid")
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("cosine", Dedup.cosineCol(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(queryId)
      .orderBy(col("cosine").desc, col(corpusId).asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rank"))
  }

  /** ANN top-k via hyperplane LSH banding + exact re-rank of candidates.
    * Approximate: recall measured against bruteForceTopK in tests.
    */
  def hyperplaneLshTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
                        k: Int, nBits: Int = 16, bands: Int = 4,
                        corpusId: String = "vec_id", corpusVec: String = "embedding",
                        queryId: String = "q_id", queryVec: String = "q_vec",
                        seed: Long = 42, dim: Int = 64): DataFrame = {
    require(nBits % bands == 0 && nBits <= 64)
    val bandBits = nBits / bands
    // signature + band key are native expressions (codegen'd, no UDF);
    // the plane table is a deterministic function of (nBits, dim, seed)
    // cached executor-side, so nothing needs broadcasting.
    def banded(df: DataFrame, id: String, vec: String): DataFrame =
      df.withColumn("sig",
          graft.functions.TextHash.hyperplaneSig(col(vec), nBits, dim, seed))
        .withColumn("band", explode(array((0 until bands).map(lit): _*)))
        .withColumn("bucket", expr(
          s"shiftleft(CAST(band AS BIGINT), 32) | " +
            s"(shiftrightunsigned(sig, band * $bandBits) & ${(1L << bandBits) - 1})"))

    val c = banded(corpus, corpusId, corpusVec)
      .select(col("bucket"), col(corpusId))
    val q = banded(queries, queryId, queryVec)
      .select(col("bucket"), col(queryId))

    // Dedup multi-band candidate pairs on ids only (a narrow shuffle),
    // then join the embedding vectors back: a distinct over rows carrying
    // two full vectors would shuffle every candidate's embeddings twice.
    val candPairs = q.join(c, "bucket")
      .filter(col(corpusId) =!= col(queryId))
      .select(col(queryId), col(corpusId))
      .distinct()
    val candidates = candPairs
      .join(broadcast(queries.select(col(queryId), col(queryVec))), queryId)
      .join(corpus.select(col(corpusId), col(corpusVec)), corpusId)
      .withColumn("cosine", Dedup.cosineCol(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(queryId)
      .orderBy(col("cosine").desc, col(corpusId).asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rank"))
  }
}
