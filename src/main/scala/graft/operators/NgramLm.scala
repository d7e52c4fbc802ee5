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
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c_w1"))
    val vocab = docs.select(explode(col(toksCol)).as("tok"))
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
}
