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
}
