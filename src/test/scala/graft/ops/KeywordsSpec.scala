package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Salient-term extraction: the (tf desc, df asc, token asc) order,
  * empty-token filtering, k bounding, and parallelism invariance.
  */
class KeywordsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("keywords-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def kw(texts: Seq[String], k: Int = 3) =
    TextOps.keywordsTfDf(docs(texts), "doc_id", "text", k)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("tf dominates, then corpus rarity, then token order") {
    // doc0: "a a b c"; "b" appears corpus-wide in 2 docs, "c" in 1.
    // tf: a=2 wins rank 1; b vs c tie on tf=1 -> rarer c (df=1) wins 2.
    val rows = kw(Seq("a a b c", "b z")).filter(_._1 == 0L)
      .sortBy(_._5)
    assert(rows.map(_._2).toSeq == Seq("a", "c", "b"))
    assert(rows.map(r => (r._3, r._4)).toSeq ==
      Seq((2L, 1L), (1L, 1L), (1L, 2L)))
  }

  test("token order closes full ties deterministically") {
    val rows = kw(Seq("d b c a")).sortBy(_._5)
    assert(rows.map(_._2).toSeq == Seq("a", "b", "c"),
      "all tf=1, df=1: bytewise token order decides")
  }

  test("k bounds the output; short docs yield fewer rows") {
    assert(kw(Seq("only two"), k = 3).length == 2)
    assert(kw(Seq("a b c d e f"), k = 3).length == 3)
  }

  test("empty tokens from repeated spaces never rank") {
    val rows = kw(Seq("a  b   c"))
    assert(!rows.exists(_._2 == ""))
    assert(rows.length == 3)
  }

  test("results are identical at any parallelism") {
    val texts = (0 until 200).map(i => s"w${i % 11} w${i % 7} w${i % 5} common")
    val a = TextOps.keywordsTfDf(docs(texts).repartition(1), "doc_id", "text", 3)
      .collect().map(_.toSeq).toSet
    val b = TextOps.keywordsTfDf(docs(texts).repartition(9), "doc_id", "text", 3)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
