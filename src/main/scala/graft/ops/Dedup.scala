package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines: MinHash+LSH,
  * SimHash, exact n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: LSH banding turns the quadratic all-pairs problem into a
  * groupBy on (band, bucket) — one shuffle keyed by bucket, candidates
  * verified pairwise only inside buckets. Hot buckets (boilerplate text)
  * are capped to bound the worst case. All hashing is seeded and
  * deterministic: the same corpus yields the same pairs at any
  * parallelism.
  */
object Dedup {

  /** FNV-1a 64-bit over UTF-8 bytes — deterministic, dependency-free. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Word n-gram shingle hash set (sorted, distinct). */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val words = text.split(" ")
    if (words.length < n) {
      if (text.isEmpty) Array.empty else Array(fnv1a64(text))
    } else {
      val out = new Array[Long](words.length - n + 1)
      var i = 0
      while (i + n <= words.length) {
        out(i) = fnv1a64(words.slice(i, i + n).mkString(" "))
        i += 1
      }
      val d = out.distinct
      java.util.Arrays.sort(d)
      d
    }
  }

  /** Exact Jaccard of two SORTED distinct hash arrays (merge intersect). */
  def jaccardSorted(sa: Array[Long], sb: Array[Long]): Double = {
    if (sa.isEmpty && sb.isEmpty) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < sa.length && j < sb.length) {
      if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
      else if (sa(i) < sb(j)) i += 1
      else j += 1
    }
    inter.toDouble / (sa.length + sb.length - inter).toDouble
  }

  /** Exact Jaccard of two docs' word n-gram shingle sets. */
  def ngramJaccard(a: String, b: String, n: Int): Double =
    jaccardSorted(shingleHashes(a, n), shingleHashes(b, n))

  // MinHash permutation parameters: (a*h + b) mod p over a Mersenne prime.
  private val MersennePrime = (1L << 61) - 1
  def permsFor(numHashes: Int, seed: Long): Array[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numHashes)((math.abs(rng.nextLong()) % (MersennePrime - 1) + 1,
      math.abs(rng.nextLong()) % MersennePrime))
  }

  /** MinHash signature of a shingle-hash set. */
  def minHashSignature(shingles: Array[Long], ps: Array[(Long, Long)]): Array[Long] = {
    val sig = Array.fill(ps.length)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val h = shingles(i) & Long.MaxValue // non-negative
      var k = 0
      while (k < ps.length) {
        val (a, b) = ps(k)
        // (a*h + b) mod p via BigInt-free 128-bit-safe math: use
        // Math.multiplyHigh-based mulmod.
        val v = mulModP(a, h) + b
        val m = if (v >= MersennePrime) v - MersennePrime else v
        if (m < sig(k)) sig(k) = m
        k += 1
      }
      i += 1
    }
    sig
  }

  /** (a * b) mod (2^61 - 1) without overflow. */
  private def mulModP(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (hi*2^64 + lo) mod p,
    // 2^64 mod p = 8 since 2^61 = 1 (mod p) => 2^64 = 2^3.
    var r = (lo & MersennePrime) + (lo >>> 61) + ((hi << 3) & MersennePrime) + (hi >>> 58)
    while (r >= MersennePrime) r -= MersennePrime
    r
  }

  /** MinHash + LSH candidate pairs with exact Jaccard verification.
    *
    * @return DataFrame(a_id, b_id, jaccard) with a_id < b_id and
    *         jaccard >= threshold.
    */
  def minHashLsh(spark: SparkSession, docs: DataFrame, idCol: String,
                 textCol: String, shingleSize: Int = 3, numHashes: Int = 64,
                 bands: Int = 16, threshold: Double = 0.5,
                 seed: Long = 42, maxBucket: Int = 64): DataFrame = {
    require(numHashes % bands == 0)
    val rowsPerBand = numHashes / bands
    val sigs = docs.select(col(idCol).as("doc_id"), col(textCol).as("doc_text"))
      .withColumn("sig", graft.functions.TextHash.minHashSig(
        col("doc_text"), shingleSize, numHashes, seed))

    val banded = sigs
      .withColumn("band", explode(array((0 until bands).map(lit): _*)))
      .withColumn("bucket",
        graft.functions.TextHash.bandKey(col("sig"), col("band"), rowsPerBand))
      .select("band", "bucket", "doc_id")

    // Hot-bucket cap BEFORE any aggregation: rank bucket members and keep
    // the first maxBucket doc ids. Only ids enter the bucket stage (texts
    // are re-joined for verification later), and no aggregation buffer
    // ever holds more than maxBucket entries, so a boilerplate bucket with
    // millions of members costs one bounded window pass instead of an
    // unbounded collect_list. The window and the groupBy share the
    // (band, bucket) clustering, so this stays a single shuffle.
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy("band", "bucket").orderBy("doc_id")
    val grouped = banded
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= maxBucket)
      .groupBy("band", "bucket")
      .agg(collect_list(col("doc_id")).as("members"))
      .filter(size(col("members")) >= 2)

    // Pairs within a bucket: self-join per (band, bucket) would duplicate
    // pairs found in multiple bands -> distinct at pair level.
    val pairUdf = udf((membersRaw: Seq[Long]) => {
      val members = membersRaw.sorted // collect_list order is nondeterministic
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var i = 0
      while (i < members.length) {
        var j = i + 1
        while (j < members.length) {
          out += ((members(i), members(j)))
          j += 1
        }
        i += 1
      }
      out.toSeq
    })

    val candidates = grouped
      .select(explode(pairUdf(col("members"))).as("pair"))
      .select(col("pair._1").as("a_id"), col("pair._2").as("b_id"))
      .distinct()

    // Verify with exact n-gram Jaccard over precomputed sorted shingle
    // sets: shingles are computed once per DOC (not twice per candidate
    // pair), only the ~8-bytes-per-shingle arrays travel through the
    // verification joins (never the documents), and the intersection is
    // a fused sorted-merge expression.
    import graft.functions.TextHash
    val shA = docs.select(col(idCol).as("a_id"),
      TextHash.shingleHashes(col(textCol), shingleSize).as("a_sh"))
    val shB = docs.select(col(idCol).as("b_id"),
      TextHash.shingleHashes(col(textCol), shingleSize).as("b_sh"))
    candidates
      .join(shA, "a_id").join(shB, "b_id")
      .withColumn("jaccard", TextHash.sortedJaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens. */
  def simHash(text: String): Long = {
    val counts = new Array[Int](64)
    for (w <- text.split(" ")) {
      val h = fnv1a64(w)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDistance, found by
    * banding the 64-bit hash into maxDistance+1 chunks (pigeonhole: any
    * pair within distance d shares at least one exact chunk).
    *
    * Hot chunk-keys (empty/boilerplate docs that all hash alike) would
    * make the bucket self-join quadratic in the hottest key, so buckets
    * are capped to the first maxBucket doc ids (same treatment as
    * minHashLsh); members of a truncated bucket can still pair through
    * their other maxDistance chunks.
    */
  def simHashPairs(spark: SparkSession, docs: DataFrame, idCol: String,
                   textCol: String, maxDistance: Int = 3,
                   maxBucket: Int = 256): DataFrame = {
    val nChunks = maxDistance + 1
    val chunkBits = 64 / nChunks
    val hashed = docs.select(col(idCol).as("doc_id"), col(textCol).as("doc_text"))
      .withColumn("sh", graft.functions.TextHash.simHash64(col("doc_text")))
    val chunkUdf = udf((sh: Long, c: Int) =>
      (sh >>> (c * chunkBits)) & ((1L << chunkBits) - 1))
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy("chunk", "key").orderBy("doc_id")
    val banded = hashed
      .withColumn("chunk", explode(array((0 until nChunks).map(lit): _*)))
      .withColumn("key", chunkUdf(col("sh"), col("chunk")))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= maxBucket)
      .select("chunk", "key", "doc_id", "sh")
    val a = banded.select(col("chunk"), col("key"),
      col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = banded.select(col("chunk"), col("key"),
      col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val hamming = udf((x: Long, y: Long) => java.lang.Long.bitCount(x ^ y))
    a.join(b, Seq("chunk", "key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh").distinct()
      .withColumn("hamming", hamming(col("a_sh"), col("b_sh")))
      .filter(col("hamming") <= maxDistance)
      .select("a_id", "b_id", "hamming")
  }

  /** All-pairs word n-gram Jaccard above threshold — the exact (non-LSH)
    * dedup reference path, with a 1:1 SQL oracle.
    *
    * Inverted gram index + AllPairs-style PREFIX FILTERING (Bayardo/Ma/
    * Srikant, WWW'07): only each doc's |A| - ceil(t*|A|) + 1 RAREST grams
    * (global document-frequency order, ties by gram) are indexed. Any
    * pair with Jaccard >= t has overlap >= ceil(t*max(|A|,|B|)), so its
    * two prefixes must share a gram — candidates stay a superset of the
    * answer and the exact verification keeps the result identical to the
    * unfiltered join. The payoff at corpus scale: a boilerplate gram
    * shared by millions of docs has maximal document frequency, lands at
    * the END of the order, and drops out of almost every prefix — the
    * sum-over-grams-of-postings^2 blowup collapses to the rare-gram part.
    * The LSH path (minHashLsh) remains the default approximate scale path.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val withSize = gramSets(docs, idCol, textCol, n)
    val candidates = ngramJaccardCandidates(withSize, threshold)
    val ga = withSize.select(col("doc_id").as("a_id"),
      col("grams").as("a_grams"), col("n_grams").as("na"))
    val gb = withSize.select(col("doc_id").as("b_id"),
      col("grams").as("b_grams"), col("n_grams").as("nb"))
    candidates
      .join(ga, "a_id").join(gb, "b_id")
      .withColumn("inter", size(array_intersect(col("a_grams"), col("b_grams"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** (doc_id, grams, n_grams): distinct word n-grams per doc. */
  def gramSets(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      expr(s"array_distinct(transform(sequence(1, greatest(size(split($textCol, ' ')) - ${n - 1}, 1)), " +
        s"i -> array_join(slice(split($textCol, ' '), i, $n), ' ')))").as("grams"))
      .withColumn("n_grams", size(col("grams")))

  /** Prefix-filtered candidate pairs (superset of all pairs with Jaccard
    * >= threshold). Exposed so the hot-gram spec can pin the candidate
    * count the filter is there to bound.
    */
  def ngramJaccardCandidates(withSize: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = withSize.select(col("doc_id"), col("n_grams"),
      explode(col("grams")).as("gram"))
    val freq = ex.groupBy("gram").agg(count(lit(1)).as("df"))
    // rarest-first canonical order; any consistent total order preserves
    // exactness, df-ascending maximizes hot-gram pruning
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("gram"))
    // epsilon before ceil: n*t can round just ABOVE an exact integer in
    // IEEE doubles (e.g. 100*0.07 = 7.000000000000001), which would
    // shrink the prefix by one and break the exactness contract for
    // thresholds whose product lands on an integer
    val prefix = ex.join(freq, "gram")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <=
        (col("n_grams") - ceil(col("n_grams") * lit(threshold) - lit(1e-9)) + 1).cast("int"))
      .select("doc_id", "gram")
    prefix.as("a")
      .join(prefix.as("b"), col("a.gram") === col("b.gram") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** Cosine similarity of two float-array columns, computed with builtin
    * higher-order functions (codegen'd, sequential accumulation order).
    */
  def cosineCol(a: Column, b: Column): Column = {
    import graft.functions.Vec
    Vec.dot(a, b) / (sqrt(Vec.norm2(a)) * sqrt(Vec.norm2(b)))
  }

  /** Embedding-cosine near-duplicate pairs above threshold (brute-force
    * pairwise; the LSH scale path lives in Similarity.randomHyperplaneLsh).
    */
  def embeddingNearDupPairs(embeddings: DataFrame, idCol: String,
                            vecCol: String, threshold: Double): DataFrame = {
    // Precompute per-vector norms once; the quadratic pair stage then only
    // evaluates the dot product (1 array pass per pair instead of 3).
    val normed = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", sqrt(graft.functions.Vec.norm2(col("vec"))))
    val a = normed.select(col("id").as("a_id"), col("vec").as("a_vec"), col("nrm").as("a_nrm"))
    val b = normed.select(col("id").as("b_id"), col("vec").as("b_vec"), col("nrm").as("b_nrm"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("dot", graft.functions.Vec.dot(col("a_vec"), col("b_vec")))
      .withColumn("cosine", col("dot") / (col("a_nrm") * col("b_nrm")))
      .filter(col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
  }

  /** Embedding near-dup pairs via hyperplane-LSH banding — the bucketed
    * scale path for embeddingNearDupPairs' exact cartesian: candidate
    * pairs form only inside signature-band buckets (one narrow ids-only
    * shuffle, hot buckets capped BEFORE pairing like minHashLsh), then
    * the exact cosine filter keeps pairs >= threshold, so the output is
    * always a subset of the exact all-pairs set and recall on a fixture
    * is provable by direct comparison (q_embed_neardup_lsh gates recall
    * 1.0 against the same DuckDB oracle as the cartesian).
    */
  def embeddingNearDupPairsLsh(embeddings: DataFrame, idCol: String,
                               vecCol: String, threshold: Double,
                               nBits: Int = 16, bands: Int = 4,
                               seed: Long = 42, dim: Int = 64,
                               maxBucket: Int = 4096): DataFrame = {
    require(nBits % bands == 0 && nBits <= 64)
    val bandBits = nBits / bands
    val banded = embeddings
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("sig",
        graft.functions.TextHash.hyperplaneSig(col("vec"), nBits, dim, seed))
      .withColumn("band", explode(array((0 until bands).map(lit): _*)))
      .withColumn("bucket", expr(
        s"shiftleft(CAST(band AS BIGINT), 32) | " +
          s"(shiftrightunsigned(sig, band * $bandBits) & ${(1L << bandBits) - 1})"))
      .select("bucket", "id")
    // ids-only bucket pairing with the hot-bucket cap applied before the
    // quadratic stage; near-identical vectors share all bands, so the
    // pair-level distinct collapses the duplicates.
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy("bucket").orderBy("id")
    val capped = banded.withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= maxBucket)
      .select("bucket", "id")
    val candPairs = capped.as("a")
      .join(capped.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    // exact verification: vectors join back only for candidates
    val normed = embeddings
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", sqrt(graft.functions.Vec.norm2(col("vec"))))
    candPairs
      .join(normed.select(col("id").as("a_id"), col("vec").as("a_vec"),
        col("nrm").as("a_nrm")), "a_id")
      .join(normed.select(col("id").as("b_id"), col("vec").as("b_vec"),
        col("nrm").as("b_nrm")), "b_id")
      .withColumn("cosine",
        graft.functions.Vec.dot(col("a_vec"), col("b_vec"))
          / (col("a_nrm") * col("b_nrm")))
      .filter(col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
  }

  /** Span-level duplicate measurement (the "deduplicating training data"
    * granularity between whole-document hashing and paragraph removal):
    * for each document, how many of its length-`spanTokens` sliding token
    * windows also occur in at least `minDocs` OTHER-or-same distinct
    * documents, and what fraction of its spans that is. Downstream, docs
    * above a dup_span_frac threshold are dropped or trimmed.
    *
    * Scale shape: spans explode to (doc_id, span) rows — narrow, id +
    * one short string — then one span-keyed aggregate with a partial
    * distinct (count(DISTINCT doc_id) two-phase), one equi-join back on
    * the span key, one doc-keyed count, and a left join onto the doc
    * spine. Documents themselves never shuffle; hot spans are a single
    * AQE-splittable join key. At deploy scale the span string is
    * replaced by a 128-bit hash to shrink shuffle rows (collision-free
    * in practice); the gate query keys by the string so the oracle
    * semantics are exact.
    */
  def spanDupStats(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 8, minDocs: Int = 2): DataFrame = {
    val toks = split(col(textCol), " ")
    val base = docs.select(col(idCol).as("doc_id"),
      greatest(size(toks) - lit(spanTokens - 1), lit(0))
        .cast("bigint").as("n_spans"),
      TextOps.wordNgrams(toks, spanTokens).as("__spans"))
    // the single-empty-gram guard marks short docs; those rows drop here
    val spanRows = base
      .select(col("doc_id"), explode(col("__spans")).as("span"))
      .filter(col("span") =!= "")
    val dupSpans = spanRows
      .groupBy("span").agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("span")
    val perDoc = spanRows.join(dupSpans, "span")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_spans"))
    base.select("doc_id", "n_spans")
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup_spans"))
      .withColumn("dup_span_frac",
        when(col("n_spans") >= 1,
          col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Span-level duplicate REMOVAL — the "act" stage over spanDupStats'
    * measurement (the ExactSubstr-style dedup of "Deduplicating
    * Training Data"): for every span (word window of `spanTokens`)
    * occurring in >= minDocs distinct documents, the KEEPER is the
    * smallest doc_id containing it; in every other document, all token
    * positions covered by that span's occurrences are dropped and the
    * text is rebuilt from the surviving tokens (order preserved).
    * Within-document repeats in the keeper survive — the rule removes
    * cross-document duplication only, which keeps it exactly mirrorable
    * in SQL (keeper choice is an integer min, coverage is integer
    * interval arithmetic; no float anywhere).
    *
    * Scale shape: the span exchange carries (doc_id, start, span) rows
    * — never documents; span stats are one two-phase aggregate (min
    * keeper + distinct-doc count); only duplicated spans join back (the
    * hot-span key is AQE-splittable); the rebuild is a per-row
    * builtin-HOF pass over the doc's own tokens. Documents never
    * shuffle: the removal-starts table (doc_id, array<long>) is the
    * only thing that joins onto the doc spine.
    */
  def spanDedupRewrite(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 8, minDocs: Int = 2): DataFrame = {
    val toks = split(col(textCol), " ")
    val base = docs.select(col(idCol).as("doc_id"), toks.as("__toks"))
    val spanRows = base
      .select(col("doc_id"), posexplode(
        TextOps.wordNgrams(col("__toks"), spanTokens)).as(Seq("pos0", "span")))
      .filter(col("span") =!= "")
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("start1"),
        col("span"))
    val spanStats = spanRows.groupBy("span")
      .agg(countDistinct(col("doc_id")).as("nd"),
        min(col("doc_id")).as("keeper"))
      .filter(col("nd") >= minDocs)
      .select("span", "keeper")
    val removals = spanRows.join(spanStats, "span")
      .filter(col("doc_id") =!= col("keeper"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("start1"))).as("__starts"))
    base.join(removals, Seq("doc_id"), "left")
      .withColumn("__covered",
        when(col("__starts").isNull, array().cast("array<bigint>"))
          .otherwise(array_distinct(flatten(transform(col("__starts"),
            s => sequence(s, s + lit(spanTokens - 1)))))))
      .withColumn("__kept",
        filter(col("__toks"),
          (_, i) => !array_contains(col("__covered"), (i + 1).cast("long"))))
      .select(col("doc_id"),
        array_join(col("__kept"), " ").as("clean_text"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_removed"))
  }
}
