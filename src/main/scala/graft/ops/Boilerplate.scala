package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate paragraph removal (the CCNet/Dolma cleaning
  * shape): a paragraph (newline-delimited) that appears in at least
  * `minDocs` distinct documents is boilerplate — cookie banners,
  * copyright footers, navigation strings — and is stripped from every
  * document, preserving the order of the surviving paragraphs.
  *
  * Scale shape, designed for the 100 TB corpus:
  *  - Finding the hot set is one map-side-combinable aggregation over
  *    exploded per-document-distinct paragraphs (count == number of
  *    documents containing the paragraph). Only (paragraph) shuffles,
  *    never the documents.
  *  - The over-threshold set is small BY DEFINITION: each member occurs
  *    in >= minDocs documents, so there are at most
  *    total_paragraphs / minDocs of them, and true boilerplate is a
  *    handful of strings. It is still capped explicitly (`maxBoilerplate`,
  *    hottest first with a deterministic tie-break) so the driver pull
  *    has a declared budget — the same bounded-pull contract as the IVF
  *    centroid table.
  *  - The rewrite pass is then a shuffle-free builtin scan: the hot set
  *    rides into a literal array and each document filters its own
  *    paragraph list with higher-order functions. Documents are read
  *    twice (stats pass + rewrite pass) but never shuffled or collected.
  *
  * No reference analogue (engine-side training-data pipeline operator).
  */
object Boilerplate {

  /** The boilerplate paragraph set: paragraphs contained in >= minDocs
    * distinct documents, hottest first, capped at maxBoilerplate with
    * ties broken by the paragraph text.
    */
  def hotParagraphs(df: DataFrame, textCol: String, minDocs: Long,
      maxBoilerplate: Int): Seq[String] = {
    df.select(explode(array_distinct(split(col(textCol), "\n"))).as("para"))
      .groupBy("para")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("para"))
      .limit(maxBoilerplate)
      .collect().map(_.getString(0)).toSeq
  }

  /** Strip boilerplate paragraphs from every document. Output adds
    * `clean_text` (surviving paragraphs re-joined in order), `n_paras`
    * (before) and `n_removed`. A document made entirely of boilerplate
    * becomes the empty string.
    */
  def removeBoilerplate(df: DataFrame, textCol: String, minDocs: Long,
      maxBoilerplate: Int = 10000): DataFrame = {
    val hot = hotParagraphs(df, textCol, minDocs, maxBoilerplate)
    // A literal array keeps the rewrite inside builtin expressions; the
    // per-paragraph membership probe is O(|hot|) which the cap bounds.
    // (For a hot set near the cap, swap to a broadcast hash join on the
    // paragraph — same result, one extra shuffle of paragraph ids.)
    val hotArr = lit(hot.toArray)
    val paras = split(col(textCol), "\n")
    df.withColumn("__paras", paras)
      .withColumn("__kept",
        filter(col("__paras"), p => !array_contains(hotArr, p)))
      .withColumn("n_paras", size(col("__paras")).cast("bigint"))
      .withColumn("n_removed",
        (size(col("__paras")) - size(col("__kept"))).cast("bigint"))
      .withColumn("clean_text", array_join(col("__kept"), "\n"))
      .drop("__paras", "__kept")
  }
}
