package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HTML -> text extraction semantics: block dropping, tag stripping,
  * entity decode ordering, and pass-through idempotence.
  */
class TextExtractSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("text-extract-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(TextOps.extractText(col("h"))).head.getString(0)
  }

  test("plain text passes through byte-identical") {
    val t = "page 7 geo:1.000000,2.000000 lorem ipsum"
    assert(extract(t) == t)
    assert(extract(s"<html><body>$t</body></html>") == t)
  }

  test("script blocks drop whole, including embedded tags and newlines") {
    val h = "<body>keep<script type=\"a\">var x = \"<div>\";\n" +
      "if (x < 2) { x = 1; }</script> this</body>"
    assert(extract(h) == "keep this")
  }

  test("style blocks drop whole") {
    assert(extract("<body><style>.c{color:red}</style>text</body>") == "text")
  }

  test("nested tags strip, inline text survives in order") {
    val h = "<div class=\"m\"><a href=\"https://x.test/\">one</a> <b>two</b><br/></div>"
    assert(extract(h) == "one two")
  }

  test("entity decode: five standard entities, ampersand decoded last") {
    assert(extract("a &lt;b&gt; &quot;c&quot; &#39;d&#39; &amp; e") ==
      "a <b> \"c\" 'd' & e")
    // &amp;lt; is the TEXT "&lt;", not a second-round "<"
    assert(extract("x &amp;lt; y") == "x &lt; y")
  }

  test("extraction after entity decode does not re-strip decoded brackets") {
    // '<' that appears only via entity decode must survive: tags are
    // stripped BEFORE decoding (the standard order).
    assert(extract("<p>&lt;not-a-tag&gt;</p>") == "<not-a-tag>")
  }
}
