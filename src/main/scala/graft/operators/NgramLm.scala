package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model scoring — the CCNet/Wikipedia-LM quality
  * signal: train add-one-smoothed bigram counts on a corpus, score each
  * document by mean log P(w_i | w_{i-1}), and expose pseudo-perplexity
  * exp(-mean). Low-perplexity ≈ fluent under the corpus distribution;
  * high ≈ gibberish/boilerplate — the classic keep/drop axis.
  *
  * Scale shape (100 TB):
  *  - Count tables (c2 on (w1,w2), c1 on w1) are hash aggregations on
  *    token keys with map-side partial agg — Zipf-skewed raw streams
  *    collapse per-partition before the exchange, so the count tables
  *    are bounded by VOCAB size, not corpus size.
  *  - Scoring joins the bigram instance stream to the count tables on
  *    the same token keys. Hot heads ("of the") skew the probe side;
  *    that is AQE skew-join territory, and the build side is a count
  *    table, not the corpus. In production prune the c2 table to
  *    min-count ≥ k (standard LM practice) and the build side shrinks
  *    by orders of magnitude; the smoothing term already covers the
  *    pruned mass.
  *  - |V| is a single scalar (broadcast), and the per-doc reduce is the
  *    only doc-keyed shuffle.
  * Determinism: mean-of-logs is rounded (6 dp) before compare — the
  * cross-engine libm/summation-order tolerance every other double gate
  * uses.
  */
object NgramLm {

  /** (id, w1, w2) bigram instances from a token-array column. */
  def bigrams(docs: DataFrame, idCol: String, toksCol: String): DataFrame =
    docs.select(col(idCol),
        explode(transform(sequence(lit(1), size(col(toksCol)) - 1),
          i => struct(element_at(col(toksCol), i).as("w1"),
                      element_at(col(toksCol), i + 1).as("w2")))).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Per-document LM score under an add-one-smoothed bigram model
    * trained on `docs` itself: `idCol, n_bigrams, avg_logprob, ppl`.
    * Documents need ≥ 2 tokens to carry a bigram; callers filter first.
    */
  def scoreBigramLm(docs: DataFrame, idCol: String, toksCol: String): DataFrame = {
    val bg = bigrams(docs, idCol, toksCol)
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
    // c(w1·) = Σ_w2 c(w1,w2): derived from the TYPE table, so its input
    // is vocab-sized — aggregating the instance stream again would cost
    // one more full tokenize+explode pass for the same numbers
    val c1 = c2.groupBy("w1").agg(sum(col("c_bg")).as("c_w1"))
    // every token of a ≥2-token doc occurs in some bigram, so the vocab
    // is exactly distinct(w1 ∪ w2) — again vocab-sized input, not a
    // corpus re-scan (callers filter docs to ≥ 2 tokens first)
    val vocab = c2.select(col("w1").as("tok"))
      .union(c2.select(col("w2").as("tok")))
      .agg(countDistinct(col("tok")).as("v"))
    bg.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab)) // one-row scalar, broadcast by construction
      .select(col(idCol),
        log((col("c_bg") + lit(1.0)) / (col("c_w1") + col("v"))).as("lp"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 6).as("avg_logprob"),
        round(exp(-avg(col("lp"))), 6).as("ppl"))
  }

  /** (id, w1, w2, w3) trigram instances from a token-array column. */
  def trigrams(docs: DataFrame, idCol: String, toksCol: String): DataFrame =
    docs.select(col(idCol),
        explode(transform(sequence(lit(1), size(col(toksCol)) - 2),
          i => struct(element_at(col(toksCol), i).as("w1"),
                      element_at(col(toksCol), i + 1).as("w2"),
                      element_at(col(toksCol), i + 2).as("w3")))).as("t"))
      .select(col(idCol), col("t.w1").as("w1"), col("t.w2").as("w2"),
              col("t.w3").as("w3"))

  /** Per-document LM score under an INTERPOLATED KNESER-NEY bigram
    * model (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.24) trained on
    * `docs` itself — the smoothing KenLM implements and the CCNet-style
    * perplexity filter actually runs, where add-one is the toy stand-in:
    *
    *   P(w2|w1) = (c(w1,w2) − D)/c(w1·) + D·N1+(w1,·)/c(w1·) · Pcont(w2)
    *   Pcont(w2) = N1+(·,w2) / N1+(··)
    *
    * with discount 0 < D < 1. Every scored bigram was counted (the model
    * is trained on the scoring corpus), so c(w1,w2) ≥ 1 > D and the
    * first term is strictly positive — no zero-probability guard needed.
    *
    * Scale shape matches [[scoreBigramLm]] with two EXTRA vocab-bounded
    * tables: the continuation counts N1+(w1,·) and N1+(·,w2) are
    * one-more aggregations over the c2 TYPE table (vocab-sized input,
    * vocab-sized output — they never touch the instance stream), and
    * N1+(··) is a broadcast scalar. The instance-stream joins and the
    * per-doc reduce are identical.
    *
    * Output: `idCol, n_bigrams, avg_logprob, ppl` (6-dp rounded, the
    * [[scoreBigramLm]] convention).
    */
  def scoreBigramKn(docs: DataFrame, idCol: String, toksCol: String,
                    discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"scoreBigramKn: discount must be in (0,1), got $discount")
    val bg = bigrams(docs, idCol, toksCol)
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
    // c(w1·), the continuation counts, and the type total all derive
    // from the c2 TYPE table — vocab-sized inputs end to end; only c2
    // itself aggregates the instance stream
    val c1 = c2.groupBy("w1").agg(sum(col("c_bg")).as("c_w1"))
    val nAfter = c2.groupBy("w1").agg(count(lit(1)).as("n_after"))
    val nBefore = c2.groupBy("w2").agg(count(lit(1)).as("n_before"))
    val nTypes = c2.agg(count(lit(1)).as("n_types"))
    bg.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .join(nAfter, Seq("w1"))
      .join(nBefore, Seq("w2"))
      .crossJoin(broadcast(nTypes))
      .select(col(idCol),
        log((col("c_bg") - lit(discount)) / col("c_w1") +
          lit(discount) * col("n_after") / col("c_w1") *
            (col("n_before") / col("n_types").cast("double"))).as("lp"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 6).as("avg_logprob"),
        round(exp(-avg(col("lp"))), 6).as("ppl"))
  }

  /** Per-document LM score under an interpolated Kneser-Ney TRIGRAM
    * model (the KenLM order-3 shape; Chen & Goodman 1999 §4.1.6) with
    * PROPER lower-order continuation counts — the detail that separates
    * real KN from naive backoff: the bigram level is estimated from
    * trigram TYPE counts (how many distinct contexts a bigram
    * continues), not from bigram instance counts:
    *
    *   P₃(w3|w1w2) = (c(w1w2w3) − D)/c(w1w2·)
    *               + D·N1+(w1w2,·)/c(w1w2·) · P₂(w3|w2)
    *   P₂(w3|w2)  = (N1+(·w2w3) − D)/N1+(·w2·)
    *               + D·N(w2,·)/N1+(·w2·) · P₁(w3)
    *   P₁(w3)     = N1+(··w3) / N1+(···)
    *
    * where N1+(·w2w3) counts distinct trigram types with suffix
    * (w2,w3), N(w2,·) counts distinct w3 in that type table per w2, and
    * P₁ is the share of trigram-suffix types ending in w3. Every scored
    * trigram was counted (trained on the scoring corpus), so both
    * discounted numerators are ≥ 1 − D > 0 and every denominator ≥ 1.
    *
    * Scale shape: ONE corpus-sized aggregation (the trigram type table
    * c3); the history totals, both continuation tables, and all three
    * normalizers derive from c3 — vocab-bounded inputs end to end. The
    * scoring joins key on token tuples, and the per-doc reduce is the
    * only doc-keyed shuffle. Documents need ≥ 3 tokens; callers filter.
    * Output: `idCol, n_trigrams, avg_logprob, ppl` (6-dp rounded).
    */
  def scoreTrigramKn(docs: DataFrame, idCol: String, toksCol: String,
                     discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"scoreTrigramKn: discount must be in (0,1), got $discount")
    val tg = trigrams(docs, idCol, toksCol)
    val c3 = tg.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c_tg"))
    // history totals + distinct-successor counts: N1+(w1w2,·)
    val cHist = c3.groupBy("w1", "w2").agg(sum(col("c_tg")).as("c_hist"),
      count(lit(1)).as("n_h"))
    // continuation table: N1+(·w2w3) — distinct w1 per trigram suffix
    val hat2 = c3.groupBy("w2", "w3").agg(count(lit(1)).as("chat"))
    // N1+(·w2·) and N(w2,·) over the continuation table
    val den2 = hat2.groupBy("w2").agg(sum(col("chat")).as("den2"),
      count(lit(1)).as("nf2"))
    // unigram continuation: N1+(··w3) and the type total N1+(···)
    val p1n = hat2.groupBy("w3").agg(count(lit(1)).as("npre"))
    val tot = hat2.agg(count(lit(1)).as("n_types"))
    tg.join(c3, Seq("w1", "w2", "w3"))
      .join(cHist, Seq("w1", "w2"))
      .join(hat2, Seq("w2", "w3"))
      .join(den2, Seq("w2"))
      .join(p1n, Seq("w3"))
      .crossJoin(broadcast(tot))
      .select(col(idCol),
        log((col("c_tg") - lit(discount)) / col("c_hist") +
          lit(discount) * col("n_h") / col("c_hist") *
            ((col("chat") - lit(discount)) / col("den2") +
             lit(discount) * col("nf2") / col("den2") *
               (col("npre") / col("n_types").cast("double")))).as("lp"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_trigrams"),
        round(avg(col("lp")), 6).as("avg_logprob"),
        round(exp(-avg(col("lp"))), 6).as("ppl"))
  }
}
