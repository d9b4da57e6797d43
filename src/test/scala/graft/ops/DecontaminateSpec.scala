package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Decontamination vs a brute string-gram reference, short-doc rule, and
  * the shuffle-free corpus-pass plan shape.
  */
class DecontaminateSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("decontaminate-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def grams(text: String, n: Int): Set[String] = {
    val w = text.split(" ")
    if (w.length < n) { if (text.isEmpty) Set.empty else Set(text) }
    else w.sliding(n).map(_.mkString(" ")).toSet
  }

  test("flags exactly the docs sharing a gram; counts distinct overlaps") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def sentence(k: Int) = Seq.fill(k)(vocab(rng.nextInt(vocab.length))).mkString(" ")
    val benchTexts = Seq.tabulate(3)(i => s"bench$i " + sentence(12))
    val contaminated = benchTexts.zipWithIndex.map { case (b, i) =>
      // embed an 8-word window of the benchmark text mid-document
      (100L + i, sentence(5) + " " + b.split(" ").slice(2, 10).mkString(" ") + " " + sentence(5))
    }
    val clean = Seq.tabulate(5)(i => (200L + i, s"clean$i " + sentence(20)))
    val corpus = (contaminated ++ clean).toDF("doc_id", "text")
    val bench = benchTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    val got = Decontaminate.flagOverlaps(spark, corpus, bench, n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val benchGrams = benchTexts.flatMap(grams(_, 8)).toSet
    val want = (contaminated ++ clean)
      .map { case (id, t) => id -> grams(t, 8).count(benchGrams) }
      .filter(_._2 >= 1).toMap
    assert(got == want)
    assert(contaminated.forall { case (id, _) => got.contains(id) },
      "every planted contamination must be flagged")
  }

  test("short docs (< n words) match on the whole text") {
    import spark.implicits._
    val corpus = Seq((1L, "tiny doc"), (2L, "other words")).toDF("doc_id", "text")
    val bench = Seq((9L, "tiny doc")).toDF("doc_id", "text")
    val got = Decontaminate.flagOverlaps(spark, corpus, bench, n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L)))
  }

  test("corpus pass plans shuffle-free (broadcast probe, no exchange)") {
    // parquet-backed input: a local Seq relation constant-folds into a
    // LocalTableScan and hides the plan under test
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val bench = corpus.filter(col("doc_id") < 2)
    val df = Decontaminate.flagOverlaps(spark, corpus, bench, n = 8)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("bench_overlap"), "probe must be the native expression")
    assert(!p.contains("Exchange"), s"corpus pass must not shuffle:\n$p")
    assert(!p.contains("ScalaUDF"), "corpus pass must stay codegen-native")
  }
}
