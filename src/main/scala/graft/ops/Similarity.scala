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
  /** Shared IVF stage: corpus rows tagged with their nearest-centroid
    * list, queries fanned out over their nProbe closest lists.
    */
  private def ivfListsAndProbes(spark: SparkSession,
      corpus: DataFrame, queries: DataFrame,
      nCentroids: Int, nProbe: Int, kmeansIters: Int,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String): (DataFrame, DataFrame) = {
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

    (corpus.withColumn("centroid", assignUdf(col(corpusVec)))
       .select(col("centroid"), col(corpusId), col(corpusVec)),
     queries.withColumn("centroid", explode(probeUdf(col(queryVec))))
       .select(col("centroid"), col(queryId), col(queryVec)))
  }

  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
              k: Int, nCentroids: Int = 16, nProbe: Int = 4,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "q_id", queryVec: String = "q_vec",
              kmeansIters: Int = 0): DataFrame = {
    val (lists, probes) = ivfListsAndProbes(spark, corpus, queries,
      nCentroids, nProbe, kmeansIters, corpusId, corpusVec, queryId, queryVec)
    val candidates = probes.join(lists, "centroid")
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("cosine", Dedup.cosineCol(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(queryId)
      .orderBy(col("cosine").desc, col(corpusId).asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rank"))
  }

  /** The production ANN deployment shape at 10^12 vectors: IVF coarse
    * lists prune the corpus (only nProbe lists per query are touched),
    * and the scan WITHIN the probed lists reads SQ8 int8 codes — a
    * quarter of the float32 bytes — scoring by the exact rescaled
    * integer dot (sq8TopK's arithmetic, engine-exact). Per-query top-k
    * is the bounded aggregate, never a window sort. A float re-rank of
    * the k winners is one more broadcast join at deploy time; the gate
    * pins the quantized ordering itself.
    */
  def ivfSq8TopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
                 k: Int, nCentroids: Int = 16, nProbe: Int = 4,
                 corpusId: String = "vec_id", corpusVec: String = "embedding",
                 queryId: String = "q_id", queryVec: String = "q_vec",
                 kmeansIters: Int = 0): DataFrame = {
    import graft.functions.{TopKByScore, Vec}
    val (lists0, probes0) = ivfListsAndProbes(spark, corpus, queries,
      nCentroids, nProbe, kmeansIters, corpusId, corpusVec, queryId, queryVec)
    val lists = withSq8Codes(lists0, corpusVec, "c_codes", Some("c_scale"))
      .select(col("centroid"), col(corpusId), col("c_codes"), col("c_scale"))
    val probes = withSq8Codes(probes0, queryVec, "q_codes")
      .select(col("centroid"), col(queryId), col("q_codes"))
    val scored = probes.join(lists, "centroid")
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("score",
        Vec.dotInt(col("q_codes"), col("c_codes")).cast("double")
          * col("c_scale"))
    scored.groupBy(queryId)
      .agg(TopKByScore.topKIds(col("score"), col(corpusId), k).as("ids"))
      .select(col(queryId), posexplode(col("ids")).as(Seq("pos", corpusId)))
      .select(col(queryId), col(corpusId),
        (col("pos") + 1).cast("long").as("rank"))
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

  /** Scalar int8 quantization (SQ8): per-vector symmetric max-abs scale,
    * code_i = floor(x_i * 127 / maxabs) — ONE double multiply+divide per
    * element and then integers everywhere, so scores are exact (the gate
    * hashes them) and cross-engine deterministic: both engines perform
    * the identical IEEE double ops on identical float inputs. The codes
    * column is 4x smaller than float32 (int8 payload in an int array
    * here; a production sink packs to BINARY), which is the point at
    * corpus scale: the ANN scan reads a quarter of the bytes.
    *
    * The two-step projection (maxabs materialized, then codes) keeps the
    * per-element lambda from re-folding the maxabs aggregate 64 times —
    * CollapseProject leaves multi-use non-cheap producers in their own
    * projection.
    */
  def withSq8Codes(df: DataFrame, vecCol: String, out: String,
                   scaleOut: Option[String] = None): DataFrame = {
    val coded = df
      .withColumn("__maxabs",
        aggregate(col(vecCol), lit(0.0),
          (m, x) => greatest(m, abs(x.cast("double")))))
      .withColumn(out,
        transform(col(vecCol), x =>
          when(col("__maxabs") === 0.0, lit(0.0))
            .otherwise(floor(x.cast("double") * lit(127.0) / col("__maxabs")))
            .cast("int")))
    scaleOut.fold(coded)(sc =>
        coded.withColumn(sc, col("__maxabs") / lit(127.0)))
      .drop("__maxabs")
  }

  /** Top-k in the quantized dot space: corpus pass computes codes once,
    * broadcast queries pair against it, and the per-query top-k is the
    * bounded TopKByScore aggregate — O(k) state through map-side
    * combine, never a per-query window sort over the corpus.
    *
    * Raw code dots are NOT comparable across corpus vectors — each
    * vector carries its own quantization scale (127/maxabs) — so the
    * score rescales by the stored per-vector factor, exactly as an SQ
    * index stores it: score = code_dot * (maxabs_c / 127). (The query's
    * own factor is a per-query positive constant and cannot reorder its
    * candidates, so it is dropped.) That is ONE integer->double
    * conversion and two IEEE ops on operands both engines share
    * bit-for-bit, so the ordering — and the gate hash — stays exact.
    * Ties break by corpus id in both engines. Recall vs the float brute
    * force is measured in Sq8Spec; a production pipeline re-ranks the
    * top candidates with the float vectors (bruteForceTopK shape over
    * k' rows).
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    import graft.functions.{TopKByScore, Vec}
    val c = withSq8Codes(corpus, corpusVec, "c_codes", Some("c_scale"))
      .select(col(corpusId), col("c_codes"), col("c_scale"))
    val q = withSq8Codes(queries, queryVec, "q_codes")
      .select(col(queryId), col("q_codes"))
    val paired = c.crossJoin(broadcast(q))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("score",
        Vec.dotInt(col("q_codes"), col("c_codes")).cast("double")
          * col("c_scale"))
    paired.groupBy(queryId)
      .agg(TopKByScore.topKIds(col("score"), col(corpusId), k).as("ids"))
      .select(col(queryId), posexplode(col("ids")).as(Seq("pos", corpusId)))
      .select(col(queryId), col(corpusId),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
