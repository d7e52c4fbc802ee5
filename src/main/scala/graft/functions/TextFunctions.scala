package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, stopword/quality scoring, language-ID heuristics, and
  * document fingerprinting — all as codegen'd built-in expressions
  * (no UDFs), so they stay inside whole-stage codegen at 100 TB.
  *
  * Capability extension beyond the reference's scalar surface
  * (SURVEY.md §2.2 exercised only trim/regex/cast/round).
  */
object TextFunctions {

  /** Whitespace tokenizer; drops empty tokens from ragged spacing. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word token count: words, numbers, and single
    * non-alphanumeric symbols — a regex proxy for tokenizer load
    * estimation.
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeishPattern))

  /** Small language-indicative stopword sets (public, commonly used
    * function-word lists).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"))

  /** Count of tokens belonging to `set`. */
  def hitCount(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set: _*)))

  /** Stopword ratio in [0,1]; 0 for empty docs. */
  def stopwordRatio(toks: Column, lang: String = "en"): Column = {
    val n = size(toks)
    when(n === 0, lit(0.0))
      .otherwise(hitCount(toks, stopwords(lang)).cast("double") / n.cast("double"))
  }

  /** Punctuation character ratio over total characters. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    val punct = total - length(regexp_replace(text, "[\\p{Punct}]", ""))
    when(total === 0, lit(0.0))
      .otherwise(punct.cast("double") / total.cast("double"))
  }

  /** Composite quality score in [0,1]: stopword-density and length
    * terms, penalized by punctuation density. Deterministic arithmetic
    * only — the exact formula is the contract (oracle re-states it).
    */
  def qualityScore(text: Column): Column =
    qualityScoreTokens(tokens(text), text)

  /** [[qualityScore]] over a MATERIALIZED token column — pipelines that
    * also fingerprint or language-ID the same doc should tokenize once
    * into a column and feed every consumer (tokens are the dominant
    * per-doc cost; see SCALING.md §4).
    */
  def qualityScoreTokens(toks: Column, text: Column): Column = {
    val lengthTerm = least(lit(1.0), size(toks).cast("double") / lit(100.0))
    val stopTerm = least(lit(1.0), stopwordRatio(toks) * lit(5.0))
    val punctPenalty = punctRatio(text)
    greatest(lit(0.0),
      lengthTerm * lit(0.5) + stopTerm * lit(0.5) - punctPenalty)
  }

  /** Rule-based language ID: the language whose stopword set hits the
    * most tokens; 'und' when nothing hits. Ties break by language code
    * order (deterministic).
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwords.toSeq.sortBy(_._1).map {
      case (lang, set) => (lang, hitCount(toks, set))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Shannon entropy (bits per character) of the character
    * distribution — the repetitive-garbage axis the token-level
    * repetition filter can miss (a doc of "ababab…" has full-length
    * token runs but ~1 bit/char). Computed as
    * `log2(n) - Σ k·log2(k) / n` over per-character counts `k`, the
    * algebraic form both engines can evaluate with identical
    * operation order.
    */
  def charEntropy(text: Column): Column =
    charEntropyChars(filter(split(text, ""), c => c =!= ""))

  /** [[charEntropy]] over a MATERIALIZED char-array column. In-row
    * cost is O(|alphabet| × len) comparisons (one filter pass per
    * distinct character) — fine for natural-language alphabets;
    * callers scoring the same doc repeatedly should materialize the
    * array once, same contract as [[qualityScoreTokens]].
    */
  def charEntropyChars(chars: Column): Column = {
    val n = size(chars).cast("double")
    val s = aggregate(array_distinct(chars), lit(0.0), (acc, ch) => {
      val k = size(filter(chars, c => c === ch)).cast("double")
      acc + k * log(2.0, k)
    })
    when(size(chars) === 0, lit(0.0))
      .otherwise(log(2.0, n) - s / n)
  }

  /** Order-insensitive content fingerprint: md5 over the sorted distinct
    * token set. Rows with identical vocabulary collide — the cheap
    * first-pass signal for near-dedup cascades.
    */
  def contentFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(distinctTokens(text))).cast("binary"))

  /** Exact-content fingerprint (normalization = trim + whitespace
    * collapse).
    */
  def exactFingerprint(text: Column): Column =
    exactFingerprintTokens(tokens(text))

  /** [[exactFingerprint]] over a materialized token column. */
  def exactFingerprintTokens(toks: Column): Column =
    md5(concat_ws(" ", toks).cast("binary"))
}
