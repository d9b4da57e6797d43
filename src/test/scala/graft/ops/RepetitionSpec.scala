package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Repetition quality filter (Gopher-style rules): duplicate-line and
  * duplicate n-gram fractions computed exactly, short-document guards,
  * and keep-threshold boundary behavior.
  */
class RepetitionSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("repetition-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def stats(texts: Seq[String]): Seq[(Long, Double, Double, Double)] = {
    import spark.implicits._
    TextOps.repetitionStats(texts.toDF("text"), "text")
      .select("n_lines", "dup_line_frac", "dup_2gram_frac", "dup_3gram_frac")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
  }

  test("duplicate n-gram fractions are exact") {
    // tokens [a b a b]: bigrams [a b, b a, a b] -> 1 - 2/3;
    // trigrams [a b a, b a b] -> distinct -> 0.0
    val Seq((n, dl, d2, d3)) = stats(Seq("a b a b"))
    assert(n == 1L && dl == 0.0)
    assert(d2 == 1.0 - 2.0 / 3.0)
    assert(d3 == 0.0)
  }

  test("duplicate line fraction counts repeated lines") {
    // lines [x, y, x, ""] -> 1 - 3/4; the trailing newline's empty line
    // is a line like any other (split keeps trailing empties)
    val Seq((n, dl, _, _)) = stats(Seq("x\ny\nx\n"))
    assert(n == 4L)
    assert(dl == 1.0 - 3.0 / 4.0)
  }

  test("documents shorter than n yield fraction 0, not an error") {
    val rows = stats(Seq("", "one", "one two"))
    assert(rows(0) == ((1L, 0.0, 0.0, 0.0)))
    assert(rows(1) == ((1L, 0.0, 0.0, 0.0)))
    // two tokens: one bigram (distinct), no trigram
    assert(rows(2)._3 == 0.0 && rows(2)._4 == 0.0)
  }

  test("a fully repeated document maxes the fractions") {
    // tokens are split on space only, so newlines stay inside tokens:
    // [spam, ham\nspam x7, ham] -> 8 bigrams, 3 distinct; 7 trigrams, 3
    val Seq((n, dl, d2, d3)) = stats(Seq(Seq.fill(8)("spam ham").mkString("\n")))
    assert(n == 8L && dl == 1.0 - 1.0 / 8.0)
    assert(d2 == 1.0 - 3.0 / 8.0 && d3 == 1.0 - 3.0 / 7.0)
  }

  test("keep threshold is inclusive (<=) and all three rules must pass") {
    import spark.implicits._
    // dup_2gram_frac exactly 0.5: [a b a b a] -> bigrams [a b, b a, a b,
    // b a] -> 1 - 2/4; fails the 0.20 rule. A distinct-token doc keeps.
    val df = TextOps.repetitionStats(
      Seq("a b a b a", "p q r s t u v w").toDF("text"), "text")
      .withColumn("keep", TextOps.repetitionKeep)
    val rows = df.select("dup_2gram_frac", "keep").collect()
    assert(rows(0).getDouble(0) == 0.5 && rows(0).getLong(1) == 0L)
    assert(rows(1).getDouble(0) == 0.0 && rows(1).getLong(1) == 1L)
  }

  test("gate-shape fixture: planted repetition fails, natural text keeps") {
    import spark.implicits._
    val natural = (0 until 40).map(i => s"doc $i has words w$i x$i y$i z$i")
    val lineSpam = natural.take(10).map(_ + "\nbuy now" * 4)
    val gramSpam = natural.take(10).map(_ + " limited offer" * 16)
    val df = TextOps.repetitionStats(
      (natural ++ lineSpam ++ gramSpam).toDF("text"), "text")
      .withColumn("keep", TextOps.repetitionKeep)
    val kept = df.agg(sum("keep")).collect()(0).getLong(0)
    assert(kept == 40L, "exactly the natural docs must survive")
  }

  test("dedupLines keeps first occurrences in order; no-newline docs pass") {
    import spark.implicits._
    def run(t: String): String =
      Seq(t).toDF("text").select(TextOps.dedupLines(col("text")))
        .head.getString(0)
    assert(run("a\nb\na\nb\nc") == "a\nb\nc", "interleaved duplicates")
    assert(run("same\nsame\nsame") == "same")
    assert(run("no newlines at all") == "no newlines at all")
    assert(run("x\n\ny\n\nx") == "x\n\ny", "empty lines dedup like any line")
  }
}
