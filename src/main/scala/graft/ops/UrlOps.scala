package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL-level curation operators for the Common-Crawl-style pages table:
  * canonicalization (the precursor to url-keyed dedup) and the shared
  * regex vocabulary for link extraction.
  *
  * Every rule is expressed twice — a codegen'd Spark `Column` chain and a
  * DuckDB SQL generator — from the SAME regex/string constants, so the
  * correctness gate compares two independent engines evaluating one
  * specification byte-for-byte. The regexes stay inside the Java/RE2
  * common dialect (no backrefs, no lookaround).
  *
  * Rule set (the standard crawl-frontier canonical form):
  *   1. strip the fragment (`#...`);
  *   2. lowercase scheme and authority ONLY (path case is significant);
  *   3. drop default ports (`:80`, `:443`);
  *   4. drop tracking query params (`utm_*`, `ref`, `fbclid`), sort the
  *      survivors bytewise, re-join; drop the `?` when none survive;
  *   5. strip trailing slashes from the path.
  *
  * All string-local: a shuffle-free map stage at any scale.
  */
object UrlOps {

  /** Params dropped by rule 4. Kept as one alternation so both engines
    * compile the identical pattern.
    */
  val trackingParamRe = "^(utm_[^=]*|ref|fbclid)="

  private val schemeAuthRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)"

  /** Canonical form of `u` per the rules above (Spark side). */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val base = regexp_replace(noFrag, "\\?.*$", "")
    val scheme = lower(regexp_extract(base, schemeAuthRe, 1))
    val host0 = lower(regexp_extract(base, schemeAuthRe, 2))
    val host = regexp_replace(host0, ":(443|80)$", "")
    val path = regexp_replace(
      regexp_replace(base, schemeAuthRe, ""), "/+$", "")
    val kept = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && !p.rlike(trackingParamRe))), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** The same canonicalization as DuckDB SQL over `uExpr`. */
  def canonicalizeUrlSql(uExpr: String): String = {
    val noFrag = s"regexp_replace($uExpr, '#.*$$', '')"
    // DuckDB regexp_replace is first-occurrence by default, like Java's
    // replaceFirst — our patterns are all anchored or tail-greedy so
    // first == only occurrence.
    val query = s"coalesce(regexp_extract($noFrag, '\\?(.*)$$', 1), '')"
    val base = s"regexp_replace($noFrag, '\\?.*$$', '')"
    val scheme = s"lower(regexp_extract($base, '$schemeAuthRe', 1))"
    val host = s"regexp_replace(lower(regexp_extract($base, '$schemeAuthRe', 2)), ':(443|80)$$', '')"
    val path = s"regexp_replace(regexp_replace($base, '$schemeAuthRe', ''), '/+$$', '')"
    // DuckDB's array_to_string([]) is NULL where Spark's array_join gives
    // '' — coalesce pins the Spark semantics.
    val kept = s"coalesce(array_to_string(list_sort(list_filter(string_split($query, '&'), " +
      s"p -> p <> '' AND NOT regexp_matches(p, '$trackingParamRe'))), '&'), '')"
    s"$scheme || '://' || $host || $path || " +
      s"(CASE WHEN $kept = '' THEN '' ELSE '?' || $kept END)"
  }

  /** href-value extraction regex (group 1 = the target URL). Works
    * identically under Java regex and RE2.
    */
  val hrefRe = "href=\"([^\"]+)\""

  /** Host component of a URL (group 1), for link-graph keying. */
  val hostRe = "https?://([^/:]+)[/:]"

  /** Full anchor tag: group 1 = href value, group 2 = anchor text.
    * Java regex and RE2 agree (no backrefs/lookaround).
    */
  val anchorTagRe = "<a href=\"([^\"]+)\">([^<]*)</a>"
}
