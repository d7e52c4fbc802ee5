package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the web-corpus front end (the step that
  * turns crawled markup into the `text` column every curation operator
  * downstream consumes; reference scope: the engine's text-cleaning
  * surface, extended to markup the way CCNet/WET extraction does).
  *
  * Implementation is a COMPOSED CHAIN of built-in `regexp_replace` /
  * `replace` calls — whole-stage-codegen'd, no UDF, and every pattern
  * is RE2-safe (no backrefs, no lookarounds), so the DuckDB oracle
  * replays the identical chain with the identical patterns: Java regex
  * and RE2 agreeing on the same inputs IS the cross-engine check (the
  * q_script_detect convention).
  *
  * Contract (a heuristic extractor, stated not hidden):
  *  - comments, <script>…</script>, <style>…</style>, and the whole
  *    <head> are dropped (title is extractable separately);
  *  - block-level tags (p/div/h1–6/li/tr/table/ul/ol/br) become
  *    newlines, every other tag becomes nothing;
  *  - the fixed entity set &lt; &gt; &quot; &#39; &apos; &nbsp; &amp;
  *    is decoded, ampersand LAST so &amp;lt; decodes to the literal
  *    "&lt;" (single-pass semantics), numeric entities beyond &#39;
  *    are out of scope;
  *  - horizontal whitespace collapses to one space, newline runs to
  *    one newline, and the result is trimmed;
  *  - a raw '>' inside an attribute value truncates that tag early
  *    (the classic single-pass-regex limit) — malformed-attribute
  *    markup is out of scope.
  */
object HtmlText {

  private val comments = "(?s)<!--.*?-->"
  private val scripts  = "(?is)<script\\b[^>]*>.*?</script>"
  private val styles   = "(?is)<style\\b[^>]*>.*?</style>"
  private val headBlk  = "(?is)<head\\b[^>]*>.*?</head>"
  private val blockTag = "(?i)</?(?:p|div|h[1-6]|li|tr|table|ul|ol|br)\\b[^>]*>"
  private val anyTag   = "<[^>]*>"
  private val titlePtn = "(?is)<title\\b[^>]*>(.*?)</title>"

  /** The page title (first <title> block, entity-decoded, trimmed);
    * empty string when absent.
    */
  def htmlTitle(html: Column): Column =
    trim(decodeEntities(regexp_extract(html, titlePtn, 1)), " \n")

  private def decodeEntities(c: Column): Column = {
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
      .foldLeft(c) { case (acc, (e, r)) => replace(acc, lit(e), lit(r)) }
    replace(decoded, lit("&amp;"), lit("&"))
  }

  /** Extracted body text under the contract above. */
  def htmlToText(html: Column): Column = {
    val stripped = Seq(comments, scripts, styles, headBlk)
      .foldLeft(html)((acc, p) => regexp_replace(acc, p, ""))
    val unTagged = regexp_replace(
      regexp_replace(stripped, blockTag, "\n"), anyTag, "")
    val decoded = decodeEntities(unTagged)
    val hspace = regexp_replace(decoded, "[ \\t\\r\\f]+", " ")
    trim(regexp_replace(hspace, " ?\\n[ \\n]*", "\n"), " \n")
  }

  /** The DuckDB rendition of [[htmlToText]] applied to SQL expression
    * `e` — the SAME patterns with RE2 'g' flags, kept adjacent to the
    * engine chain so they cannot drift apart.
    */
  def htmlToTextSql(e: String): String = {
    val stripped = Seq(comments, scripts, styles, headBlk)
      .foldLeft(e)((acc, p) => s"regexp_replace($acc, '$p', '', 'g')")
    val unTagged =
      s"regexp_replace(regexp_replace($stripped, '$blockTag', chr(10), 'g'), " +
        s"'$anyTag', '', 'g')"
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&apos;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(unTagged) { case (acc, (ent, r)) =>
        s"replace($acc, '$ent', '$r')" }
    val hspace = s"regexp_replace($decoded, '[ \\t\\r\\f]+', ' ', 'g')"
    s"trim(regexp_replace($hspace, ' ?\\n[ \\n]*', chr(10), 'g'), ' ' || chr(10))"
  }

  /** DuckDB rendition of [[htmlTitle]]. */
  def htmlTitleSql(e: String): String = {
    val raw = s"regexp_extract($e, '$titlePtn', 1)"
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&apos;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(raw) { case (acc, (ent, r)) =>
        s"replace($acc, '$ent', '$r')" }
    s"trim($decoded, ' ' || chr(10))"
  }
}
