package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
  * distribution looks like a small TARGET corpus (the "make CommonCrawl
  * look like Wikipedia" selection axis used by GPT-3/PaLM-style
  * pipelines, in its deterministic bag-of-hashed-ngrams form).
  *
  *  1. featurize: unigram + bigram stream, hashed into `numBuckets`
  *     buckets (md5-prefix arithmetic — a pure function of content, so
  *     the whole pipeline replays exactly in the DuckDB oracle and is
  *     retry/repartition-stable at scale);
  *  2. fit two multinomial bucket distributions (target vs raw),
  *     add-one smoothed;
  *  3. per-doc importance weight `log w = Σ_features llr(bucket)` with
  *     `llr = log p_target − log p_raw`;
  *  4. resample: Gumbel-perturbed top-k (sampling WITHOUT replacement
  *     from the softmax of log-weights), with the Gumbel noise derived
  *     from md5(id) — deterministic, content-keyed, oracle-checkable.
  *
  * Scale shape (100 TB):
  *  - The ONLY corpus-sized shuffles are the bucket-count aggregation
  *    (map-side partial agg collapses the Zipf-skewed feature stream to
  *    ≤ `numBuckets` rows per partition before the exchange) and the
  *    per-doc weight reduce (doc-keyed, the operator's output).
  *  - Both fitted distributions are ≤ `numBuckets` rows — broadcast by
  *    construction; the scoring join never shuffles the feature stream.
  *  - Selection is top-k by a scalar score: TakeOrdered (per-partition
  *    k then merge), no global sort.
  * No counterpart in the reference (pandas/SQL dashboard — see
  * SURVEY.md §2); this is LLM-pipeline capability the brief requires.
  */
object Dsir {

  /** `idCol, bucket` hashed feature instances: unigrams + bigrams of the
    * token-array column, `bucket = md5-prefix(ngram) mod numBuckets`.
    * 8 hex digits < 2^32 so the conv arithmetic is exact in a long.
    */
  def hashedNgrams(docs: DataFrame, idCol: String, toksCol: String,
                   numBuckets: Int): DataFrame = {
    val uni = docs.select(col(idCol), explode(col(toksCol)).as("ng"))
    val bi = docs
      .filter(size(col(toksCol)) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col(toksCol)) - 1),
          i => concat_ws(" ", element_at(col(toksCol), i),
                              element_at(col(toksCol), i + 1)))).as("ng"))
    uni.unionByName(bi).select(col(idCol),
      (conv(substring(md5(col("ng")), 1, 8), 16, 10).cast("long")
        % numBuckets).as("bucket"))
  }

  /** Per-bucket feature counts (≤ numBuckets rows — broadcast-sized).
    * The smoothed log-probabilities and the corpus totals both derive
    * from THIS frame downstream: deriving them from `feats` directly
    * (as the first cut did) referenced the corpus-sized feature explode
    * once per aggregate, and DataFrame plans are trees — the explode +
    * per-n-gram md5 ran four times per raw corpus (r18 opt).
    */
  private def bucketCounts(feats: DataFrame): DataFrame =
    feats.groupBy("bucket").agg(count(lit(1)).as("c"))

  /** Per-raw-doc DSIR importance weight:
    * `idCol, n_features, log_weight` (log_weight rounded 6 dp — the
    * cross-engine summation-order tolerance every double gate uses).
    * Docs with zero features (empty token arrays) are absent — callers
    * filter or treat missing as "no evidence".
    *
    * `smoothedLogP(side)` for a bucket UNSEEN on that side is
    * `log(1/(N_side+B))` — applied in-join via coalesce, so neither
    * distribution table needs densifying to all `numBuckets` rows.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, toksCol: String,
                        numBuckets: Int = 4096): DataFrame = {
    val rawF = hashedNgrams(raw, idCol, toksCol, numBuckets)
    val tgtF = hashedNgrams(target, idCol, toksCol, numBuckets)
    // ONE pass per side builds the bucket histogram; totals are B-row
    // sums over it (NOT fresh corpus-sized count jobs — the target
    // explode now runs once, the raw explode twice: histogram +
    // scoring join, down from three and four references).
    val cT = bucketCounts(tgtF)
    val cR = bucketCounts(rawF)
    val nT = cT.agg(coalesce(sum(col("c")), lit(0L)).as("n_t"))
    val nR = cR.agg(coalesce(sum(col("c")), lit(0L)).as("n_r"))
    // llr table ≤ numBuckets rows: broadcast; a side's unseen bucket
    // contributes coalesce(c, 0), so log((0+1)/(N+B)) IS the smoothing
    // floor log(1/(N+B)) — bit-identical to the previous
    // coalesce-on-logp form (same doubles through the same log).
    val llr = cT.withColumnRenamed("c", "c_t")
      .join(cR.withColumnRenamed("c", "c_r"), Seq("bucket"), "full_outer")
      .crossJoin(broadcast(nT)).crossJoin(broadcast(nR))
      .select(col("bucket"),
        (log((coalesce(col("c_t"), lit(0L)) + lit(1.0)) /
             (col("n_t") + lit(numBuckets.toDouble))) -
         log((coalesce(col("c_r"), lit(0L)) + lit(1.0)) /
             (col("n_r") + lit(numBuckets.toDouble))))
          .as("llr"))
    rawF.join(broadcast(llr), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
           round(sum(col("llr")), 6).as("log_weight"))
  }

  /** Deterministic Gumbel-top-k resample over a weights frame: returns
    * the `k` rows with the largest `log_weight + Gumbel(md5(id:salt))`
    * — exact sampling without replacement from softmax(log_weight),
    * replayable because the noise is content-keyed (same md5→uniform
    * arithmetic as [[Sampling.weightedKey]]). Output adds `score`
    * (rounded 6 dp); ties broken on `idCol` so the result is total.
    */
  def resampleTopK(weights: DataFrame, idCol: String, logWCol: String,
                   k: Int, salt: String = "dsir"): DataFrame = {
    val hex8 = substring(
      md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 8)
    val u = (conv(hex8, 16, 10).cast("double") + 0.5) / 4294967296.0
    val gumbel = -log(-log(u))
    weights
      .withColumn("score", round(col(logWCol) + gumbel, 6))
      .orderBy(desc("score"), asc(idCol))
      .limit(k)
  }
}
