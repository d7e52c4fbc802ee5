package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive-Bayes document classifier — the deterministic
  * cousin of the fastText-style quality classifiers real pretraining
  * pipelines use to keep/drop documents (GPT-3's WebText-vs-CommonCrawl
  * LR filter, LLaMA's Wikipedia-reference classifier, CCNet's fastText
  * stage). Training IS aggregation here — class priors and word-class
  * counts — so both training and scoring are plain DataFrame programs
  * with no iterative driver loop, and the whole model fits the same
  * add-one-smoothing contract a SQL oracle can re-state exactly.
  *
  * Scale shape (100 TB):
  *  - The word-class count table is a hash aggregation on token keys
  *    with map-side partial agg — bounded by |V| × |classes|, not by
  *    corpus size (same argument as [[NgramLm]]'s count tables).
  *  - Class priors, per-class token totals, and |V| are one-row scalar
  *    frames, broadcast by construction.
  *  - Scoring joins the token instance stream to the |V|-row count
  *    table on the token key (Zipf heads are AQE skew-join territory;
  *    the build side is vocabulary-sized). The per-doc reduce is the
  *    only doc-keyed shuffle.
  *  - Unseen-per-class words need no outer join: the count table has a
  *    row for every corpus token, with a zero class count where the
  *    class never saw it — add-one smoothing covers the zero.
  * Determinism: log-odds is rounded (6 dp) before compare, and the
  * predicted label derives from the ROUNDED value so both engines
  * decide ties identically.
  */
object NbClassifier {

  /** Train on `docs` (binary 0/1 `labelCol`) and score every document
    * under the trained model: `idCol, y, n_tokens, log_odds,
    * pred_label` where `log_odds = log P(y=1|d) - log P(y=0|d)` up to
    * the shared evidence term, and `pred_label = [log_odds > 0]`.
    * Documents need ≥ 1 token to carry a score; callers filter first.
    */
  def trainScoreBinary(docs: DataFrame, idCol: String, toksCol: String,
                       labelCol: String): DataFrame = {
    val toks = docs.select(col(idCol), col(labelCol).as("y"),
      explode(col(toksCol)).as("tok"))
    // |V| × 2 count table: one row per corpus token, zero where a class
    // never saw the token (the add-one term handles the zero).
    val wc = toks.groupBy("tok").agg(
      sum(when(col("y") === 0, 1L).otherwise(0L)).as("c0"),
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("c1"))
    // Scalar model constants: per-class token totals + vocab size, and
    // per-class document counts (the priors). Two one-row frames.
    val tot = toks.agg(
      sum(when(col("y") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("n1"),
      countDistinct(col("tok")).as("v"))
    val dc = docs.agg(
      sum(when(col(labelCol) === 0, 1L).otherwise(0L)).as("d0"),
      sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("d1"))
    val logOdds = round(
      log(col("d1").cast("double") / col("d0")) + col("s1") - col("s0"), 6)
    toks.join(wc, Seq("tok"))
      .crossJoin(broadcast(tot)) // one-row scalar, broadcast by construction
      .select(col(idCol), col("y"),
        log((col("c0") + lit(1.0)) / (col("n0") + col("v"))).as("lp0"),
        log((col("c1") + lit(1.0)) / (col("n1") + col("v"))).as("lp1"))
      .groupBy(col(idCol), col("y"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lp0")).as("s0"), sum(col("lp1")).as("s1"))
      .crossJoin(broadcast(dc)) // one-row scalar, broadcast by construction
      .select(col(idCol), col("y"), col("n_tokens"),
        logOdds.as("log_odds"),
        when(logOdds > 0, 1).otherwise(0).as("pred_label"))
  }
}
