package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Span-level duplicate measurement: exact window counting, the
  * distinct-documents rule, short-document guards, and threshold
  * parameters.
  */
class SpanDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("span-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(texts: Seq[String], span: Int = 4, minDocs: Int = 2) = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    Dedup.spanDupStats(df, "id", "text", spanTokens = span, minDocs = minDocs)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
  }

  test("a span shared by two documents is counted in both") {
    // docs share exactly the 4-token window "p q r s"; every other
    // window contains a doc-unique token
    val out = run(Seq("a1 p q r s b1", "a2 p q r s b2"))
    // 6 tokens -> 3 spans; only the middle one is shared
    assert(out == Seq((3L, 1L, 1.0 / 3.0), (3L, 1L, 1.0 / 3.0)))
  }

  test("a span repeated inside ONE document is not a cross-doc duplicate") {
    val out = run(Seq("p q r s x p q r s", "totally different words here now"))
    assert(out.map(_._2) == Seq(0L, 0L))
  }

  test("documents shorter than the span are zero, not an error") {
    val out = run(Seq("a b c", "", "p q r s", "p q r s"))
    assert(out(0) == ((0L, 0L, 0.0)))
    assert(out(1) == ((0L, 0L, 0.0)))
    // the two 4-token docs are one identical span each
    assert(out(2) == ((1L, 1L, 1.0)))
    assert(out(3) == ((1L, 1L, 1.0)))
  }

  test("minDocs raises the duplication bar") {
    val texts = Seq("p q r s one", "p q r s two", "p q r s three")
    assert(run(texts, minDocs = 2).map(_._2) == Seq(1L, 1L, 1L))
    assert(run(texts, minDocs = 4).map(_._2) == Seq(0L, 0L, 0L))
  }

  test("every window of a fully copied document is duplicated") {
    val copy = "w x y z u v"
    val out = run(Seq(copy, copy, "unrelated content words only here"))
    assert(out(0) == ((3L, 3L, 1.0)) && out(1) == ((3L, 3L, 1.0)))
    assert(out(2)._2 == 0L)
  }

  test("documents never shuffle: only span and id rows cross exchanges") {
    import spark.implicits._
    val df = (0 until 8).map(i => (i.toLong, s"p q r s tail$i")).toDF("id", "text")
    val out = Dedup.spanDupStats(df, "id", "text", spanTokens = 4)
    val plan = out.queryExecution.executedPlan.toString
    val parts = "hashpartitioning\\([^)]*".r.findAllIn(plan).toSeq
    assert(parts.nonEmpty)
    assert(!parts.exists(_.contains("text#")),
      s"document text must never be a shuffle key:\n${parts.mkString("\n")}")
  }

  private def rewrite(texts: Seq[String], span: Int = 4) = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    Dedup.spanDedupRewrite(df, "id", "text", spanTokens = span)
      .orderBy("doc_id")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
  }

  test("rewrite: keeper (min doc) keeps the span, the other doc loses " +
    "exactly the covered positions") {
    val out = rewrite(Seq("a1 p q r s b1", "a2 p q r s b2"))
    assert(out(0) == ("a1 p q r s b1", 0L), "keeper untouched")
    assert(out(1) == ("a2 b2", 4L), "covered window dropped, rest kept")
  }

  test("rewrite: overlapping duplicated windows remove the coverage UNION") {
    // 5 shared tokens -> two overlapping 4-windows in both docs
    val out = rewrite(Seq("a1 p q r s t b1", "a2 p q r s t b2"))
    assert(out(0)._2 == 0L)
    assert(out(1) == ("a2 b2", 5L))
  }

  test("rewrite: short documents and within-keeper repeats are untouched") {
    val out = rewrite(Seq("p q r s x p q r s", "one two three"))
    assert(out(0) == ("p q r s x p q r s", 0L),
      "within-doc repeats are not cross-doc duplicates")
    assert(out(1) == ("one two three", 0L), "short doc passes through")
  }

  test("rewrite: a fully copied document empties (clean_text '', all removed)") {
    val out = rewrite(Seq("p q r s t", "p q r s t"))
    assert(out(0) == ("p q r s t", 0L))
    assert(out(1) == ("", 5L))
  }

  test("rewrite: deterministic at any parallelism") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff")
    val texts = Seq.tabulate(60)(i =>
      if (i % 5 == 0) "p q r s shared tail marker words here"
      else Seq.fill(10)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    def run(parts: Int) = Dedup.spanDedupRewrite(
        df.repartition(parts), "id", "text", spanTokens = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(run(1) == run(7))
  }
}
