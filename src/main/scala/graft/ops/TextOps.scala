package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for web-scale training-data pipelines: token counting,
  * quality scoring, language ID, and document fingerprinting.
  *
  * Everything here is built from Spark builtin column functions
  * (codegen'd, no UDFs), so the operators run inside whole-stage codegen
  * and push down column pruning to the scan. Each has an exact SQL mirror
  * for the DuckDB oracle.
  */
object TextOps {

  /** Whitespace token count: split on single space (empty tokens kept —
    * identical semantics to the oracle's string_split).
    */
  def tokenCountWhitespace(text: Column): Column = size(split(text, " "))

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") /
      length(text).cast("double")

  /** Common-English stopwords used by the quality heuristics. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Count of stopword occurrences among whitespace tokens. */
  def stopwordHits(textCol: String): Column = {
    val inSet = stopwords.map(w => s"x = '$w'").mkString(" OR ")
    expr(s"aggregate(transform(split($textCol, ' '), x -> CASE WHEN $inSet THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v)")
  }

  /** Composite quality score in [0, ~1]: length capped + stopword signal -
    * punctuation penalty. Mirrors the oracle formula exactly.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCountWhitespace(t).cast("double")
    val stopHits = stopwordHits(textCol).cast("double")
    df.withColumn("n_tokens", nTok)
      .withColumn("stop_ratio", stopHits / nTok)
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("quality",
        least(nTok / lit(64.0), lit(1.0)) * lit(0.5)
          + least(col("stop_ratio") * lit(4.0), lit(1.0)) * lit(0.3)
          + (lit(1.0) - least(col("punct_ratio") * lit(10.0), lit(1.0))) * lit(0.2))
  }

  /** Marker words per language for the n-gram/marker language-ID
    * heuristic. Deterministic argmax with fixed precedence order.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "es" -> Seq("el", "la", "y", "los", "es", "una", "por", "para"),
    "pt" -> Seq("o", "a", "e", "os", "um", "uma", "para", "com"))

  /** Language-ID: argmax of marker-word hit counts; ties resolved by the
    * fixed language order above; no hits at all -> "und".
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    var out = df
    for ((lang, words) <- langMarkers) {
      val inSet = words.map(w => s"x = '$w'").mkString(" OR ")
      out = out.withColumn(s"hits_$lang",
        expr(s"aggregate(transform(split($textCol, ' '), x -> CASE WHEN $inSet THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v)"))
    }
    // Pick the first language (in precedence order) whose count equals the
    // max, provided the max is positive.
    val maxHits = greatest(langMarkers.map(l => col(s"hits_${l._1}")): _*)
    val pick = langMarkers.reverse.foldLeft(lit("und"): Column) {
      case (acc, (lang, _)) =>
        when(col(s"hits_$lang") === maxHits && maxHits > 0, lit(lang)).otherwise(acc)
    }
    out.withColumn("pred_lang", pick)
      .drop(langMarkers.map(l => s"hits_${l._1}"): _*)
  }

  /** Polynomial rolling-hash fingerprint over codepoints:
    * fp = fold(0, cp -> (fp * 31 + cp) mod 1e9+7). Identical in the SQL
    * oracle via list_reduce.
    */
  def fingerprint(textCol: String): Column =
    expr(s"aggregate(transform(split($textCol, ''), c -> ascii(c)), 0L, (acc, v) -> (acc * 31 + CAST(v AS BIGINT)) % 1000000007)")

  /** Fraction of duplicate elements in an array: 1 - distinct/total
    * (0.0 for empty). Operand-identical to the SQL mirror, so the
    * resulting doubles are bit-equal across engines.
    */
  def dupFrac(arr: Column): Column =
    when(size(arr) >= 1,
      lit(1).cast("double")
        - size(array_distinct(arr)).cast("double") / size(arr).cast("double"))
      .otherwise(lit(0.0))

  /** Word n-grams over whitespace tokens as joined strings; documents
    * with fewer than n tokens yield a single empty gram (dupFrac 0.0 —
    * same value the SQL mirror's empty list produces). Builtin
    * higher-order functions only: transform/sequence/slice/concat_ws,
    * all codegen'd.
    */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(lit("")))

  /** Per-document salient-term extraction: the top-k tokens by
    * (tf desc, df asc, token asc) — term frequency first, corpus rarity
    * as the tie-break, bytewise token order closing all ties. The
    * all-integer ordering makes the result exact at any parallelism (no
    * idf logarithm, no double comparisons — the TF-IDF ranking without
    * its float hazard).
    *
    * Scale shape: explode → (doc, token) tf agg and token df agg, both
    * map-side combinable; the df join keys on token (hot stopwords are
    * one AQE-splittable key); the top-k window partitions by DOCUMENT,
    * whose size is bounded by per-doc vocabulary — never a hot-stratum
    * single-reducer sort (unlike domain strata, a document cannot grow
    * with the corpus).
    */
  def keywordsTfDf(df: DataFrame, idCol: String, textCol: String,
                   k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol),
        explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(dfreq, "token")
      .withColumn("kw_rank", row_number().over(w).cast("long"))
      .filter(col("kw_rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("kw_rank"))
  }

  /** Repetition signals — the Gopher-style "repetitious text" quality
    * rules (published MassiveText filtering recipe): per-document
    * fraction of duplicate lines and duplicate word 2-/3-grams. A
    * shuffle-free codegen scan; no reference analogue (engine-side
    * training-data pipeline operator).
    */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    // Materialize each array in its own projection: dupFrac consumes its
    // argument three times, and the n-gram builders are interpreted
    // higher-order functions — CollapseProject keeps the expensive
    // producer separate instead of inlining it 3x per row.
    df.withColumn("__lines", split(col(textCol), "\n"))
      .withColumn("__g2", wordNgrams(toks, 2))
      .withColumn("__g3", wordNgrams(toks, 3))
      .withColumn("n_lines", size(col("__lines")).cast("bigint"))
      .withColumn("dup_line_frac", dupFrac(col("__lines")))
      .withColumn("dup_2gram_frac", dupFrac(col("__g2")))
      .withColumn("dup_3gram_frac", dupFrac(col("__g3")))
      .drop("__lines", "__g2", "__g3")
  }

  /** Keep decision for the repetition filter (thresholds from the same
    * recipe shape: dup lines <= 0.30, dup 2-grams <= 0.20, dup 3-grams
    * <= 0.18), emitted as 0/1 for engine-stable hashing.
    */
  def repetitionKeep: Column =
    (col("dup_line_frac") <= lit(0.30) &&
      col("dup_2gram_frac") <= lit(0.20) &&
      col("dup_3gram_frac") <= lit(0.18)).cast("bigint")

  /** PII patterns, chosen to parse identically under Java regex (Spark)
    * and RE2 (DuckDB): plain character classes and bounded repetition, no
    * backreferences or lookaround. Escaped here as Scala string literals;
    * the regex text is `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`
    * and `\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}`.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

  /** PII redaction: replace every email / E.164-ish phone with a typed
    * placeholder. Two chained regexp_replace builtins — codegen'd,
    * shuffle-free, one scan pass; the standard pre-training scrub stage.
    * Phones are redacted on the email-redacted text, but the patterns
    * cannot overlap (emails need '@', phones start at '+'), so the two
    * counts below are computed independently on the original text.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailPattern), lit(0))).cast("long")

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(phonePattern), lit(0))).cast("long")

  /** SQL oracle mirrors (DuckDB dialect) ------------------------------- */

  def stopwordHitsSql(textExpr: String): String = {
    val inSet = stopwords.map(w => s"w = '$w'").mkString(" OR ")
    s"list_sum([CASE WHEN $inSet THEN 1 ELSE 0 END for w in string_split($textExpr, ' ')])"
  }

  def langIdSql(textExpr: String): String = {
    val hitExprs = langMarkers.map { case (lang, words) =>
      val inSet = words.map(w => s"w = '$w'").mkString(" OR ")
      lang -> s"list_sum([CASE WHEN $inSet THEN 1 ELSE 0 END for w in string_split($textExpr, ' ')])"
    }
    val maxExpr = s"greatest(${hitExprs.map(_._2).mkString(", ")})"
    // first language in precedence order reaching the max
    val caseChain = hitExprs.map { case (lang, e) =>
      s"WHEN $e = $maxExpr AND $maxExpr > 0 THEN '$lang'"
    }.mkString(" ")
    s"(CASE $caseChain ELSE 'und' END)"
  }

  /** DuckDB mirror of [[dupFrac]]: identical operands and operation
    * order, so the doubles are bit-equal.
    */
  def dupFracSql(arrExpr: String): String =
    s"(CASE WHEN len($arrExpr) >= 1 THEN CAST(1 AS DOUBLE) - CAST(len(list_distinct($arrExpr)) AS DOUBLE) / CAST(len($arrExpr) AS DOUBLE) ELSE 0.0 END)"

  /** DuckDB mirror of [[wordNgrams]] (list comprehension over 1-based
    * inclusive slices); short documents yield the empty list, whose
    * dupFracSql is 0.0 — the same value the Spark side's single-empty-
    * gram guard produces.
    */
  def wordNgramsSql(toksExpr: String, n: Int): String =
    s"[array_to_string(($toksExpr)[i:i+${n - 1}], ' ') for i in range(1, len($toksExpr) - ${n - 2})]"

  def fingerprintSql(textExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(unicode(c) AS BIGINT) for c in string_split($textExpr, '')]), (a, b) -> (a * 31 + b) % 1000000007)"

  /** DuckDB regexp_replace replaces only the first match unless the 'g'
    * option is passed; Spark's always replaces all — hence the explicit
    * 'g' here. The pattern text is identical byte-for-byte.
    */
  def redactPiiSql(textExpr: String): String =
    s"regexp_replace(regexp_replace($textExpr, '$emailPattern', '<EMAIL>', 'g'), '$phonePattern', '<PHONE>', 'g')"

  def emailCountSql(textExpr: String): String =
    s"CAST(len(regexp_extract_all($textExpr, '$emailPattern')) AS BIGINT)"

  def phoneCountSql(textExpr: String): String =
    s"CAST(len(regexp_extract_all($textExpr, '$phonePattern')) AS BIGINT)"

  /** HTML -> text extraction (the input_hint's core per-row operation:
    * the `text` column IS the extraction of `html`, byte-identical per
    * url). Deterministic builtin chain — script/style blocks dropped
    * whole, remaining tags stripped, then the five standard entities
    * decoded with `&amp;` LAST so `&amp;lt;` correctly yields the
    * literal text `&lt;` rather than `<`. All patterns parse the same
    * under Java regex and RE2 ((?s) + lazy repetition are in both), and
    * entity decoding is plain substring replace in both engines, so the
    * extraction is byte-identical across engines.
    */
  val scriptBlockRe = "(?s)<script[^>]*>.*?</script>"
  val styleBlockRe = "(?s)<style[^>]*>.*?</style>"
  val tagRe = "<[^>]*>"
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&amp;" -> "&")

  def extractText(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(html, scriptBlockRe, ""), styleBlockRe, "")
    val noTags = regexp_replace(noBlocks, tagRe, "")
    htmlEntities.foldLeft(noTags) { case (c, (e, ch)) =>
      replace(c, lit(e), lit(ch))
    }
  }

  /** Within-document duplicate-line removal (the CCNet line-dedup
    * cleaning step): keep the FIRST occurrence of each line, order
    * preserved. Pure per-row array work — `array_position(lines, x) ==
    * i+1` keeps exactly first occurrences (Spark's filter-lambda index
    * is 0-based; DuckDB's is 1-based and its list_position is 1-based,
    * so the SQL twin compares `= i` directly). Shuffle-free builtin
    * scan; scales with scan bandwidth.
    */
  def dedupLines(text: Column): Column = {
    val lines = split(text, "\n")
    array_join(
      filter(lines, (x, i) =>
        array_position(lines, x) === (i + 1).cast("long")), "\n")
  }

  def dedupLinesSql(textExpr: String): String =
    s"array_to_string(list_filter(string_split($textExpr, chr(10)), " +
      s"(x, i) -> list_position(string_split($textExpr, chr(10)), x) = i), chr(10))"

  def extractTextSql(htmlExpr: String): String = {
    val noBlocks = s"regexp_replace(regexp_replace($htmlExpr, " +
      s"'$scriptBlockRe', '', 'g'), '$styleBlockRe', '', 'g')"
    val noTags = s"regexp_replace($noBlocks, '$tagRe', '', 'g')"
    htmlEntities.foldLeft(noTags) { case (sql, (e, ch)) =>
      val chq = if (ch == "'") "''" else ch
      s"replace($sql, '$e', '$chq')"
    }
  }
}
