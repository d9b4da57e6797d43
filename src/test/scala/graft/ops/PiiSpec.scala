package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII redaction semantics: every match replaced (not just the first),
  * PII-free text passes through byte-identical, counts are independent
  * per kind, and the patterns behave the same at string boundaries.
  */
class PiiSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("pii-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(texts: Seq[String]): Seq[(String, Long, Long)] = {
    import spark.implicits._
    texts.toDF("text")
      .select(TextOps.redactPii(col("text")).as("r"),
        TextOps.emailCount(col("text")).as("e"),
        TextOps.phoneCount(col("text")).as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("replaces every occurrence, not just the first") {
    val Seq((r, e, p)) = run(Seq(
      "mail a@b.com then c.d@e-f.org call +1-555-0100 or +44-555-0199 end"))
    assert(r == "mail <EMAIL> then <EMAIL> call <PHONE> or <PHONE> end")
    assert(e == 2 && p == 2)
  }

  test("text without PII is byte-identical") {
    val texts = Seq(
      "plain words only",
      "at sign alone @ is not an email",
      "a dangling +1-555 prefix is not a phone",
      "user@host misses the dot-tld",
      "")
    assert(run(texts).map(_._1) == texts)
    assert(run(texts).forall(t => t._2 == 0 && t._3 == 0))
  }

  test("matches at the very start and very end of the string") {
    val Seq((r1, e1, _), (r2, _, p2)) = run(Seq(
      "x@y.io starts it", "ends with +1-555-0000"))
    assert(r1 == "<EMAIL> starts it" && e1 == 1)
    assert(r2 == "ends with <PHONE>" && p2 == 1)
  }

  test("counts are computed on the original text, independent per kind") {
    // an email whose local part is digit-heavy must not count as a phone
    val Seq((r, e, p)) = run(Seq("reach 15550100@mail.com today"))
    assert(r == "reach <EMAIL> today")
    assert(e == 1 && p == 0)
  }

  test("greedy match consumes the whole address, no residue") {
    val Seq((r, _, _)) = run(Seq("a.b_c%d+e@sub.domain.co.uk!"))
    assert(r == "<EMAIL>!")
  }
}
