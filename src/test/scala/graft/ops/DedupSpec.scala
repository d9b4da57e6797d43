package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data pipeline operators: LSH recall vs planted duplicates,
  * SimHash banding completeness, ANN recall vs brute force, multimodal
  * batch plumbing, determinism across parallelism levels.
  */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsWithPlanted = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" graftdupmarker")).as("text"))
    (docs, docs.unionByName(planted))
  }

  test("minhash LSH finds every planted near-duplicate") {
    val (docs, all) = docsWithPlanted
    val n = docs.count()
    val pairs = Dedup.minHashLsh(spark, all, "doc_id", "text", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every (id, id+100000) planted pair must be found: jaccard of a doc
    // and its one-token-appended copy is (g)/(g+1) >= 0.6 for g >= 2.
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val missing = ids.filter(id => !pairs.contains((id, id + 100000)))
    assert(missing.isEmpty, s"missing planted pairs for ids: ${missing.take(5).mkString(",")}")
  }

  test("minhash LSH deterministic across parallelism") {
    val (_, all) = docsWithPlanted
    val a = Dedup.minHashLsh(spark, all.repartition(2), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Dedup.minHashLsh(spark, all.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b)
  }

  test("simhash banding finds planted near-duplicates within distance") {
    val (docs, all) = docsWithPlanted
    val pairs = Dedup.simHashPairs(spark, all, "doc_id", "text", maxDistance = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // appended token flips few bits; most planted pairs are within 3.
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val found = ids.count(id => pairs.contains((id, id + 100000)))
    assert(found >= ids.length / 2, s"simhash found only $found of ${ids.length}")
    // verify hamming distances are correct on a sample
    val sample = Dedup.simHashPairs(spark, all, "doc_id", "text", maxDistance = 3)
      .limit(20).collect()
    for (r <- sample) {
      val h = r.getAs[Number](2).longValue()
      assert(h >= 0 && h <= 3)
    }
  }

  test("hyperplane LSH finds near-duplicate neighbors (its actual use case)") {
    // Corpus = embeddings + perturbed near-copies; querying with the
    // perturbed copy must retrieve the original as the top LSH hit.
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val perturbed = emb.select((col("vec_id") + 100000).as("vec_id"),
      expr("transform(embedding, (x, i) -> CAST(CASE WHEN i % 2 = 0 THEN x * CAST(1.02 AS FLOAT) ELSE x * CAST(0.98 AS FLOAT) END AS FLOAT))")
        .as("embedding"))
    val corpus = emb.unionByName(perturbed)
    val queries = perturbed.filter(col("vec_id") < 100050)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val lsh = Similarity.hyperplaneLshTopK(spark, corpus, queries, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = (100000L until 100050L).count(q => lsh.get(q).contains(q - 100000))
    assert(hits >= 45, s"LSH near-dup recall $hits/50 too low")

    // Sanity vs brute force on the far-apart random corpus: recall is
    // expectedly partial but candidates must be a strict subset re-ranked
    // identically.
    val q2 = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val brute = Similarity.bruteForceTopK(emb, q2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.hyperplaneLshTopK(spark, emb, q2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(approx.contains).toDouble / brute.size
    assert(recall >= 0.2, s"ANN recall $recall collapsed")
  }

  test("hot bucket: 10k identical docs complete with bounded pair output") {
    // The 100 TB failure mode: boilerplate text puts millions of docs in
    // one LSH bucket. The window cap bounds every aggregation buffer and
    // the pair fan-out to maxBucket, so this completes instead of OOMing.
    import spark.implicits._
    val hot = (0L until 10000L)
      .map(i => (i, "the same boilerplate text repeated on every page of the site"))
      .toDF("doc_id", "text")
    val mh = Dedup.minHashLsh(spark, hot, "doc_id", "text",
      threshold = 0.6, maxBucket = 64)
    assert(mh.count() === 64L * 63 / 2, "pairs capped to first 64 bucket members")
    // document text must never enter the bucket aggregation
    val aggLines = mh.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("collect_list")).toSeq
    assert(aggLines.nonEmpty && aggLines.forall(!_.contains("doc_text")),
      "bucket aggregation must collect ids only")
    val sh = Dedup.simHashPairs(spark, hot, "doc_id", "text",
      maxDistance = 3, maxBucket = 64)
    assert(sh.count() === 64L * 63 / 2, "simhash bucket join capped")
  }

  test("IVF ANN finds near-duplicate neighbors and keeps sane recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val perturbed = emb.select((col("vec_id") + 100000).as("vec_id"),
      expr("transform(embedding, (x, i) -> CAST(CASE WHEN i % 2 = 0 THEN x * CAST(1.02 AS FLOAT) ELSE x * CAST(0.98 AS FLOAT) END AS FLOAT))")
        .as("embedding"))
    val corpus = emb.unionByName(perturbed)
    val queries = perturbed.filter(col("vec_id") < 100050)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val ivf = Similarity.ivfTopK(spark, corpus, queries, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // a perturbed copy and its original quantize to the same centroid
    // (cosine ~0.9996), so near-dup recall must be essentially perfect
    val hits = (100000L until 100050L).count(q => ivf.get(q).contains(q - 100000))
    assert(hits >= 48, s"IVF near-dup recall $hits/50 too low")

    // against brute force on far-apart random vectors recall is partial
    // but must be well above chance
    val q2 = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val brute = Similarity.bruteForceTopK(emb, q2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(spark, emb, q2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(approx.contains).toDouble / brute.size
    assert(recall >= 0.2, s"IVF recall $recall collapsed")
  }

  test("k-means refinement lifts IVF recall@3 to >= 0.9") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val brute = Similarity.bruteForceTopK(emb, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Similarity.ivfTopK(spark, emb, queries, k = 3,
      nProbe = 6, kmeansIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(refined.contains).toDouble / brute.size
    assert(recall >= 0.9, s"refined IVF recall@3 $recall below 0.9")
    // and strictly at least as good as the unrefined quantizer at the
    // same probe budget
    val base = Similarity.ivfTopK(spark, emb, queries, k = 3, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val baseRecall = brute.count(base.contains).toDouble / brute.size
    assert(recall >= baseRecall,
      s"k-means recall $recall below unrefined $baseRecall")
  }

  test("ngram jaccard matches hand-computed value") {
    assert(Dedup.ngramJaccard("a b c d", "a b c d", 3) === 1.0)
    // "a b c d e" 3-grams: {abc, bcd, cde}; "a b c d x": {abc, bcd, cdx}
    val j = Dedup.ngramJaccard("a b c d e", "a b c d x", 3)
    assert(math.abs(j - 2.0 / 4.0) < 1e-15)
  }

  test("prefix filtering bounds hot-gram candidates without losing pairs") {
    // 2010 docs that ALL share a 5-word boilerplate suffix (4 hot bigrams,
    // document frequency 2010) plus 20 doc-unique words; 10 planted exact
    // duplicates. The unfiltered inverted-index join would emit every
    // co-boilerplate pair (~2M candidates); the prefix filter must keep
    // only pairs sharing a RARE gram — the 10 planted ones — because the
    // hot grams sort last in df order and fall outside every prefix.
    import spark.implicits._
    val boiler = "hot1 hot2 hot3 hot4 hot5"
    val base = (0 until 2000).map { i =>
      (i.toLong, (0 until 20).map(k => s"u${i}w$k").mkString(" ") + " " + boiler)
    }
    val dups = (0 until 10).map(i => (10000L + i, base(i)._2))
    val docs = (base ++ dups).toDF("doc_id", "text")

    val withSize = Dedup.gramSets(docs, "doc_id", "text", 2)
    val nCand = Dedup.ngramJaccardCandidates(withSize, 0.5).count()
    assert(nCand <= 100,
      s"prefix filter must prune the hot-gram blowup, got $nCand candidates")

    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs === (0 until 10).map(i => (i.toLong, 10000L + i, 1.0)).toSet)
  }

  test("prefix length survives FP-boundary thresholds (ceil of n*t just above an integer)") {
    // 100*0.07 = 7.000000000000001 in IEEE doubles: a naive
    // ceil(n_grams*t) yields 8 and shrinks the prefix by one, dropping a
    // pair at Jaccard exactly 0.07 whose shared grams are the most
    // frequent in the big doc's order. The epsilon before ceil keeps it.
    import spark.implicits._
    val shared = (0 until 7).map(k => s"s$k")
    val docA = (1L, shared, 7)
    val docB = (2L, shared ++ (0 until 93).map(k => s"b$k"), 100)
    // fillers inflate the shared grams' document frequency so they sort
    // LAST in rarest-first order — the exact placement the bug drops
    val fillers = (0 until 50).map(i => (100L + i, shared, 7))
    val withSize = (Seq(docA, docB) ++ fillers)
      .toDF("doc_id", "grams", "n_grams")
    val cands = Dedup.ngramJaccardCandidates(withSize, 0.07)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Jaccard(A,B) = 7/100 = 0.07 >= t: the candidate set must keep it
    assert(cands.contains((1L, 2L)),
      s"FP-boundary pair dropped by the prefix filter; candidates: $cands")
  }

  test("prefix-filtered jaccard pairs equal brute force on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120)
    val dist = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val local = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (ida, ta) <- local; (idb, tb) <- local; if ida < idb
      j = Dedup.ngramJaccard(ta, tb, 3)
      if j >= 0.3
    } yield (ida, idb, j)).toSet
    assert(brute.nonEmpty, "fixture must contain at least one near-dup pair")
    assert(dist === brute)
  }

  test("multimodal: real codecs round-trip synthesize -> decode -> features") {
    val media = Multimodal.synthesize(spark, 300)
    val features = Multimodal.extractFeatures(media).collect()
    assert(features.length === 300) // every payload decodes
    for (f <- features) {
      f.kind match {
        case "image" =>
          val (w, h) = Multimodal.imageDims(f.media_id)
          assert((f.width, f.height, f.channels, f.n_frames) === ((w, h, 3, 1)))
          assert(f.mean0 === Multimodal.imageColor(f.media_id)._1.toDouble)
        case "audio" =>
          assert(f.width === Multimodal.audioSamples(f.media_id))
          assert((f.height, f.channels) === ((1, 1)))
          assert(f.mean0 === Multimodal.audioAmplitude(f.media_id).toDouble)
        case "video" =>
          val side = Multimodal.videoSide(f.media_id)
          assert((f.width, f.height, f.channels) === ((side, side, 3)))
          assert(f.n_frames === Multimodal.videoFrames(f.media_id))
          assert(f.mean0 === Multimodal.imageColor(f.media_id)._1.toDouble)
      }
    }
    // determinism across partitions
    val again = Multimodal.extractFeatures(Multimodal.synthesize(spark, 300, 3))
      .collect().sortBy(_.media_id)
    assert(features.sortBy(_.media_id).toSeq === again.toSeq)
    // corrupted payloads are rejected, not crashed
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.decodeWav(Array.fill(32)(0x7f.toByte)) === None)
    assert(Multimodal.videoFramePayloads(Array[Byte](9, 9, 9, 9, 0)) === None)
  }

  test("resize + frame sampling use the real image pipeline") {
    val png = Multimodal.encodePng(64, 48, (200, 10, 30))
    val resized = Multimodal.resizeImage(png, 32).get
    val Some((w, h, bands, mean)) = Multimodal.decodeImage(resized)
    assert((w, h, bands) === ((32, 24, 3)))
    assert(mean === 200.0) // solid color survives resampling exactly
    assert(Multimodal.resizeImage(png, 100).get eq png) // no upscale
    // video frame sampling decodes every other frame
    val frames = (0 until 4).map(f => Multimodal.encodePng(16, 16, (f * 10, 0, 0)))
    val sampled = Multimodal.sampleFrames(Multimodal.encodeVideo(frames), 2)
    assert(sampled.toSeq === Seq((16, 16, 3, 0.0), (16, 16, 3, 20.0)))
    assert(Multimodal.frameOffsets(10, 3).toSeq === Seq(0, 3, 6, 9))
  }
}
