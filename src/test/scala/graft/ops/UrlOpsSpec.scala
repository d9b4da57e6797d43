package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization rules, one assertion per rule plus combined and
  * idempotence cases. The Spark Column chain is the implementation under
  * test; the DuckDB SQL twin is exercised by the q_url_canon oracle gate.
  */
class UrlOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("urlops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def canon(us: String*): Seq[String] = {
    import spark.implicits._
    us.toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).as[String].collect().toSeq
  }

  test("fragment stripped") {
    assert(canon("https://a.test/x#sec-2") == Seq("https://a.test/x"))
  }

  test("scheme and authority lowercased, path case preserved") {
    assert(canon("HTTPS://A.Test/KeepCase/X") == Seq("https://a.test/KeepCase/X"))
  }

  test("default ports dropped, explicit ports kept") {
    assert(canon(
      "https://a.test:443/x", "http://a.test:80/x", "https://a.test:8443/x") ==
      Seq("https://a.test/x", "http://a.test/x", "https://a.test:8443/x"))
  }

  test("tracking params dropped, survivors sorted, bare ? dropped") {
    assert(canon(
      "https://a.test/x?utm_source=f&b=2&a=1&ref=rss",
      "https://a.test/x?utm_campaign=c&fbclid=z",
      "https://a.test/x?z=1&y=2") ==
      Seq("https://a.test/x?a=1&b=2", "https://a.test/x", "https://a.test/x?y=2&z=1"))
  }

  test("ref must be a whole param name: href/prefix params survive") {
    assert(canon("https://a.test/x?href=1&refid=2&ref=3") ==
      Seq("https://a.test/x?href=1&refid=2"))
  }

  test("trailing slashes stripped (also multiple)") {
    assert(canon("https://a.test/x/", "https://a.test/x///") ==
      Seq("https://a.test/x", "https://a.test/x"))
  }

  test("all rules combined") {
    assert(canon("HTTPS://Ex.Test:443/Path/Sub/?ref=r&b=2&a=1#frag") ==
      Seq("https://ex.test/Path/Sub?a=1&b=2"))
  }

  test("canonical form is a fixed point") {
    val once = canon(
      "HTTPS://Ex.Test:443/Path/?utm_x=1&b=2#f", "https://a.test/x?a=1")
    assert(canon(once: _*) == once)
  }

  test("href and host regexes extract link-graph keys") {
    import spark.implicits._
    val h = """<p><a href="https://t1.test/a">x</a><a href="http://t2.test:8080/b">y</a></p>"""
    val hrefs = Seq(h).toDF("h")
      .select(explode(regexp_extract_all(col("h"), lit(UrlOps.hrefRe), lit(1))).as("href"))
      .select(col("href"), regexp_extract(col("href"), UrlOps.hostRe, 1).as("host"))
      .as[(String, String)].collect().toSeq
    assert(hrefs == Seq(
      ("https://t1.test/a", "t1.test"), ("http://t2.test:8080/b", "t2.test")))
  }

  test("anchor tag regex yields (href, text) pairs; empty text allowed") {
    import spark.implicits._
    val h = """<a href="https://t1.test/a">Go here</a><b>no</b>""" +
      """<a href="https://t2.test/b"></a><a name="x">not a link</a>"""
    val pairs = Seq(h).toDF("h")
      .select(explode(
        regexp_extract_all(col("h"), lit(UrlOps.anchorTagRe), lit(0))).as("tag"))
      .select(regexp_extract(col("tag"), UrlOps.anchorTagRe, 1).as("href"),
        regexp_extract(col("tag"), UrlOps.anchorTagRe, 2).as("text"))
      .as[(String, String)].collect().toSeq
    assert(pairs == Seq(
      ("https://t1.test/a", "Go here"), ("https://t2.test/b", "")))
  }
}
