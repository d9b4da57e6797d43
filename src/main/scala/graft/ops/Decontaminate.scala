package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share at least
  * one word n-gram with an evaluation/benchmark set, so eval data can be
  * excluded from training corpora.
  *
  * Scale shape — deliberately different from the dedup family: the
  * benchmark side is small by definition (eval suites are megabytes next
  * to a 100 TB corpus), so its distinct gram-hash set is collected once,
  * sorted, and broadcast; the corpus side is then ONE shuffle-free map
  * pass (shingle expression + merge-count probe, both inside whole-stage
  * codegen). No exchange touches the corpus at any size.
  *
  * Matching is on FNV-1a shingle hashes (the same kernel the MinHash
  * pipeline shingles with); the oracle audits raw gram strings — the two
  * coincide absent 64-bit collisions, the declared trade the rest of the
  * dedup family already makes.
  */
object Decontaminate {

  /** Distinct sorted n-gram hashes of the benchmark set (driver-side;
    * bounded by the benchmark corpus, not the training corpus).
    */
  def benchmarkGrams(benchmark: DataFrame, textCol: String, n: Int): Array[Long] = {
    import graft.functions.TextHash
    val grams = benchmark
      .select(explode(TextHash.shingleHashes(col(textCol), n)).as("g"))
      .distinct().collect().map(_.getLong(0))
    java.util.Arrays.sort(grams)
    grams
  }

  /** (id, n_hits) for every corpus doc sharing >= 1 n-gram with the
    * benchmark set; n_hits counts the doc's DISTINCT overlapping grams.
    */
  def flagOverlaps(spark: SparkSession, corpus: DataFrame, benchmark: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   n: Int = 8): DataFrame = {
    import graft.functions.TextHash
    val bc = spark.sparkContext.broadcast(benchmarkGrams(benchmark, textCol, n))
    corpus
      .withColumn("n_hits",
        TextHash.benchOverlap(TextHash.shingleHashes(col(textCol), n), bc))
      .filter(col("n_hits") >= 1)
      .select(col(idCol), col("n_hits"))
  }
}
