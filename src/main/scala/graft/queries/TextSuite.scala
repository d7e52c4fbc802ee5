package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions._

/** Text-analysis operators over the documents table: token statistics,
  * quality scoring, language ID, fingerprinting — each with a DuckDB
  * oracle that re-states the exact arithmetic (all divisions performed
  * in the same order, so doubles match bit-for-bit before rounding).
  */
object TextSuite extends QuerySuite {

  // DuckDB-side normalized token list (empty tokens filtered like
  // TextFunctions.tokens).
  private val toksSql =
    """list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"""

  private val textStats = GraftQuery(
    "q_text_stats",
    (s, d) =>
      documents(s, d).select(
          col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          length(col("text")).as("n_chars"),
          bpeishTokenCount(col("text")).cast("long").as("n_bpeish"))
        .orderBy(asc("doc_id")),
    Some(s"""SELECT doc_id,
               CAST(len($toksSql) AS INTEGER) AS n_tokens,
               CAST(length(text) AS INTEGER) AS n_chars,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish
             FROM documents ORDER BY doc_id"""),
    headline = true)

  private val qualityScore = GraftQuery(
    "q_quality_score",
    (s, d) => {
      val toks = tokens(col("text"))
      documents(s, d).select(
          col("doc_id"),
          round(stopwordRatio(toks), 6).as("stop_ratio"),
          round(punctRatio(col("text")), 6).as("punct_ratio"),
          round(graft.functions.TextFunctions.qualityScore(col("text")), 6)
            .as("quality"))
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, text, $toksSql AS toks FROM documents),
             m AS (
               SELECT doc_id, text, len(toks) AS n,
                 len(list_filter(toks, x -> x IN
                   ('the','a','an','and','of','to','in','is','it','that')))
                   AS stop_hits,
                 length(text) AS total,
                 length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
                   AS punct
               FROM t),
             r AS (
               SELECT doc_id,
                 CASE WHEN n = 0 THEN 0.0
                      ELSE CAST(stop_hits AS DOUBLE) / CAST(n AS DOUBLE) END
                   AS stop_ratio,
                 CASE WHEN total = 0 THEN 0.0
                      ELSE CAST(punct AS DOUBLE) / CAST(total AS DOUBLE) END
                   AS punct_ratio,
                 least(1.0, CAST(n AS DOUBLE) / 100.0) AS length_term
               FROM m)
             SELECT doc_id, ROUND(stop_ratio, 6) AS stop_ratio,
               ROUND(punct_ratio, 6) AS punct_ratio,
               ROUND(greatest(0.0,
                 length_term * 0.5 + least(1.0, stop_ratio * 5.0) * 0.5
                 - punct_ratio), 6) AS quality
             FROM r ORDER BY doc_id"""))

  private val langIdQ = GraftQuery(
    "q_lang_id",
    (s, d) => {
      val toks = tokens(col("text"))
      documents(s, d).select(
          col("doc_id"),
          hitCount(toks, stopwords("en")).as("en_hits"),
          hitCount(toks, stopwords("es")).as("es_hits"),
          hitCount(toks, stopwords("fr")).as("fr_hits"),
          hitCount(toks, stopwords("de")).as("de_hits"),
          langId(col("text")).as("predicted"))
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
             h AS (
               SELECT doc_id,
                 CAST(len(list_filter(toks, x -> x IN
                   ('the','a','an','and','of','to','in','is','it','that')))
                   AS INTEGER) AS en_hits,
                 CAST(len(list_filter(toks, x -> x IN
                   ('el','la','los','las','de','que','y','en','un','una')))
                   AS INTEGER) AS es_hits,
                 CAST(len(list_filter(toks, x -> x IN
                   ('le','la','les','de','des','et','un','une','est','que')))
                   AS INTEGER) AS fr_hits,
                 CAST(len(list_filter(toks, x -> x IN
                   ('der','die','das','und','ist','ein','eine','nicht','mit','zu')))
                   AS INTEGER) AS de_hits
               FROM t)
             SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
               CASE
                 WHEN de_hits > 0 AND de_hits >= en_hits AND de_hits >= es_hits
                   AND de_hits >= fr_hits THEN 'de'
                 WHEN en_hits > 0 AND en_hits >= es_hits AND en_hits >= fr_hits
                   AND en_hits >= de_hits THEN 'en'
                 WHEN es_hits > 0 AND es_hits >= fr_hits AND es_hits >= de_hits
                   AND es_hits >= en_hits THEN 'es'
                 WHEN fr_hits > 0 AND fr_hits >= es_hits AND fr_hits >= de_hits
                   AND fr_hits >= en_hits THEN 'fr'
                 ELSE 'und'
               END AS predicted
             FROM h ORDER BY doc_id"""))

  private val fingerprint = GraftQuery(
    "q_fingerprint",
    (s, d) =>
      documents(s, d).select(
          col("doc_id"),
          exactFingerprint(col("text")).as("exact_fp"),
          contentFingerprint(col("text")).as("content_fp"))
        .orderBy(asc("doc_id")),
    Some(s"""SELECT doc_id,
               md5(array_to_string($toksSql, ' ')) AS exact_fp,
               md5(array_to_string(list_sort(list_distinct($toksSql)), ' '))
                 AS content_fp
             FROM documents ORDER BY doc_id"""))

  /** Rolling-hash (winnowing-style) fingerprint via the custom codegen
    * expression. Reduced-form oracle (round 10): the hash is
    * engine-defined, so the oracle pins (a) four probe rows — short,
    * exactly-K-byte, window-sliding, and empty inputs — whose expected
    * values are computed at registration time through the same JVM
    * primitive the codegen forwards to (driver-eval vs codegen parity +
    * drift pinning, baked into the SQL as literals), and (b) the
    * SQL-decidable invariant fp ≠ 0 ⟺ nonempty text (fingerprint
    * returns 0 only for zero-length byte input).
    */
  private val rollingProbes = Seq(
    9000001L -> "probe alpha",
    9000002L -> "exactly16bytes!!",
    9000003L -> "a longer probe text that slides the sixteen-byte window",
    9000004L -> "")

  private val rollingFp = GraftQuery(
    "q_rolling_fingerprint",
    (s, d) => {
      graft.plans.GraftFunctions.register(s)
      import s.implicits._
      val base = documents(s, d).select(col("doc_id"), col("text"))
        .unionByName(rollingProbes.toDF("doc_id", "text"))
      base.select(col("doc_id"),
          graft.functions.RollingFingerprint
            .rolling_fingerprint(col("text")).as("fp"))
        .select(col("doc_id"),
          when(col("doc_id") >= 9000000L, col("fp").cast("string"))
            .otherwise(lit(null).cast("string")).as("probe_fp"),
          (col("fp").isNotNull && col("fp") =!= 0L).as("fp_nonzero"))
        .orderBy(asc("doc_id"))
    },
    Some(s"""SELECT doc_id, CAST(NULL AS VARCHAR) AS probe_fp,
               (text IS NOT NULL AND length(text) > 0) AS fp_nonzero
             FROM documents
             UNION ALL
             SELECT * FROM (VALUES ${rollingProbes.map { case (id, t) =>
               val v = graft.functions.RollingFingerprint.fingerprint(
                 org.apache.spark.unsafe.types.UTF8String.fromString(t))
               s"(CAST($id AS BIGINT), '$v', ${v != 0L})"
             }.mkString(", ")})
             ORDER BY doc_id"""))

  override val queries: Seq[GraftQuery] =
    Seq(textStats, qualityScore, langIdQ, fingerprint, rollingFp)
}
