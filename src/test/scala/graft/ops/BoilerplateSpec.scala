package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boilerplate paragraph removal: threshold semantics, per-document
  * distinct counting, order preservation, the hot-set cap, and the
  * shuffle-free rewrite plan.
  */
class BoilerplateSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("boilerplate-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("strips over-threshold paragraphs, preserves order, keeps the rest") {
    val banner = "accept all cookies"
    val docs = (0 until 6).map(i => s"$banner\nbody $i\ntail $i") :+ "clean doc"
    val out = Boilerplate.removeBoilerplate(df(docs), "text", minDocs = 5)
      .orderBy("id").select("clean_text", "n_paras", "n_removed").collect()
    for (i <- 0 until 6) {
      assert(out(i).getString(0) == s"body $i\ntail $i")
      assert(out(i).getLong(1) == 3L && out(i).getLong(2) == 1L)
    }
    assert(out(6).getString(0) == "clean doc" && out(6).getLong(2) == 0L)
  }

  test("threshold is inclusive; below-threshold paragraphs survive") {
    val freq5 = (0 until 5).map(i => s"shared five\nown $i")
    val freq4 = (0 until 4).map(i => s"shared four\nmine $i")
    val out = Boilerplate.removeBoilerplate(df(freq5 ++ freq4), "text", minDocs = 5)
      .agg(sum("n_removed")).collect()(0).getLong(0)
    assert(out == 5L, "exactly the five 'shared five' instances go")
  }

  test("repeats within one document count once toward n_docs but are all removed") {
    // 'dup' appears in only 2 documents (below minDocs=3) even though one
    // doc repeats it 4 times; 'hot' appears in 3 docs and is stripped
    // everywhere, including every repeat
    val docs = Seq(
      "dup\ndup\ndup\ndup\nhot",
      "dup\nhot\nbody",
      "hot\nother")
    val out = Boilerplate.removeBoilerplate(df(docs), "text", minDocs = 3)
      .orderBy("id").select("clean_text").collect().map(_.getString(0))
    assert(out(0) == "dup\ndup\ndup\ndup")
    assert(out(1) == "dup\nbody")
    assert(out(2) == "other")
  }

  test("a document that is entirely boilerplate becomes the empty string") {
    val docs = (0 until 5).map(_ => "legal notice") :+ "real content"
    val out = Boilerplate.removeBoilerplate(df(docs), "text", minDocs = 5)
      .orderBy("id").select("clean_text", "n_removed").collect()
    assert(out(0).getString(0) == "" && out(0).getLong(1) == 1L)
    assert(out(5).getString(0) == "real content")
  }

  test("the cap keeps the hottest paragraphs, ties broken by text") {
    val docs =
      (0 until 6).map(i => s"very hot\nwarm b\ndoc $i") ++
        (0 until 5).map(i => s"warm a\nwarm b\nalso $i")
    // warm a (5 docs) and warm b (11) and very hot (6) all clear minDocs=5;
    // cap 2 keeps (warm b, very hot) — 'warm a' survives in the text
    val out = Boilerplate.removeBoilerplate(df(docs), "text",
      minDocs = 5, maxBoilerplate = 2)
      .orderBy("id").select("clean_text").collect().map(_.getString(0))
    assert(out(0) == "doc 0")
    assert(out(6) == "warm a\nalso 0")
  }

  test("the rewrite pass is a shuffle-free builtin scan") {
    val docs = (0 until 5).map(i => s"hdr\nbody $i")
    val out = Boilerplate.removeBoilerplate(df(docs), "text", minDocs = 5)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"documents must not shuffle:\n$p")
    assert(!p.contains("ScalaUDF"), "rewrite must stay builtin-only")
  }
}
