package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, repartition-stable sampling operators.
  *
  * At 100 TB, sampling must be (a) pushdown-friendly — a pure filter the
  * scan can evaluate, no shuffle, no RNG state per task — and (b) stable
  * under retries / repartitioning, which `df.sample()` (per-task RNG
  * seeded by partition id) is NOT: a lost executor replays a partition
  * with the same seed but possibly different row order. Keying the
  * decision off row CONTENT (a key column) makes the sample a pure
  * function of the data.
  *
  * Capability extension beyond the reference (no sampling surface there;
  * natural for training-data curation subsampling).
  */
object Sampling {

  /** Keep rows whose key ≡ r (mod n) — the 1/n systematic sample.
    * SQL-expressible, so it stays oracle-checkable.
    */
  def moduloSample(df: DataFrame, keyCol: String, n: Int, r: Int = 0): DataFrame =
    df.filter(pmod(col(keyCol), lit(n)) === r)

  /** Keep ~`fraction` of rows by 64-bit key hash — decorrelated from any
    * arithmetic structure in the key (modulo sampling is biased when keys
    * carry structure, e.g. only even ids). Deterministic per key.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction")
    val buckets = 1000000L
    df.filter(pmod(xxhash64(col(keyCol)), lit(buckets)) <
      lit((fraction * buckets).toLong))
  }

  /** Efraimidis–Spirakis weighted-sampling key: rank rows by
    * u^(1/w) descending and take the top k for a weighted sample
    * WITHOUT replacement — heavier rows win proportionally more often.
    *
    * u is derived from md5 of the key (first 8 hex digits → uniform in
    * (0,1)), not rand(): the sample is a pure function of content, so
    * it is retry/repartition-stable AND cross-engine checkable (the
    * md5→hex→int arithmetic replays exactly in the DuckDB oracle).
    * At scale, top-k-by-key is a TakeOrdered (per-partition k, then
    * merge) — no global sort.
    */
  def weightedKey(keyCol: Column, weightCol: Column,
                  salt: String = "ws"): Column = {
    val hex8 = substring(md5(concat(keyCol.cast("string"), lit(":" + salt))), 1, 8)
    val u = (conv(hex8, 16, 10).cast("double") + 0.5) / 4294967296.0
    pow(u, lit(1.0) / weightCol.cast("double"))
  }

  /** Temperature-based mixture resampling (the mT5/XLM-R multilingual
    * recipe): sampling rates ∝ p_s^α flatten a skewed stratum
    * distribution toward uniform as α→0. For stratum s with n_s rows,
    * the target share is n_s^α / Σ_t n_t^α and the per-row keep rate
    * is `min(1, budget · share / n_s)`.
    *
    * Returns the ≤ |strata| rows `strataCol, n_rows, rate` — broadcast
    * by construction; [[temperatureSample]] applies it. Deterministic:
    * rates are pure arithmetic over counts, the row filter is the md5
    * uniform (content-keyed, retry-stable, oracle-replicable) — no RNG.
    */
  def temperatureMixRates(df: DataFrame, strataCol: String,
                          alpha: Double, budget: Long): DataFrame = {
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("n_rows"))
      .withColumn("w", pow(col("n_rows").cast("double"), lit(alpha)))
    val total = counts.agg(sum(col("w")).as("sw"))
    counts.crossJoin(broadcast(total)) // one-row scalar
      .select(col(strataCol), col("n_rows"),
        round(least(lit(1.0),
          lit(budget.toDouble) * col("w") / col("sw") /
            col("n_rows").cast("double")), 6).as("rate"))
  }

  /** Apply [[temperatureMixRates]]: keep rows whose md5-uniform (keyed
    * on `keyCol`) clears the stratum's rate. The rates frame is
    * ≤ |strata| rows — the join broadcasts; the corpus never shuffles.
    */
  def temperatureSample(df: DataFrame, strataCol: String, keyCol: String,
                        rates: DataFrame, salt: String = "tmix"): DataFrame = {
    val hex8 = substring(
      md5(concat(col(keyCol).cast("string"), lit(":" + salt))), 1, 8)
    val u = (conv(hex8, 16, 10).cast("double") + 0.5) / 4294967296.0
    df.join(broadcast(rates.select(col(strataCol), col("rate"))),
        Seq(strataCol))
      .filter(u < col("rate"))
  }

  /** Stratified sample: per-stratum fractions via content hash — the
    * deterministic analogue of `df.stat.sampleBy`. Strata absent from
    * `fractions` are dropped.
    */
  def stratifiedHashSample(df: DataFrame, strataCol: String, keyCol: String,
                           fractions: Map[String, Double]): DataFrame = {
    val buckets = 1000000L
    val threshold: Column = fractions.foldLeft(lit(-1L)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * buckets).toLong)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(col(keyCol)), lit(buckets)) < threshold)
  }

  /** Cluster-balanced selection: cap each EMBEDDING-SPACE cluster at
    * `cap` members — the topic-diversity analogue of the per-host
    * document cap (SemDeDup removes near-identical cells; this bounds
    * over-represented TOPICS that survive dedup — boilerplate-heavy
    * genres, template families).
    *
    * Clusters are [[Similarity.ivfAssign]] cells (deterministic seed
    * centroids ⇒ the whole selection replays in SQL); within a cell,
    * rows keep by `ordering` (pass a total order — e.g. quality desc,
    * id asc) through [[GroupedTopK]], so the plan is the
    * WindowGroupLimit shape: per-partition top-cap, no global sort.
    *
    * Returns the kept rows as (idCol, cell, rank).
    */
  def clusterBalance(corpus: DataFrame, nCells: Int, cap: Int,
                     ordering: Seq[Column],
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val assigned = Similarity.ivfAssign(corpus, nCells, idCol, vecCol)
      .select(col("ivf_id").as(idCol), col("cell"))
    val joined = corpus.join(assigned, Seq(idCol))
    GroupedTopK(joined, Seq("cell"), ordering, k = cap)
      .select(col(idCol), col("cell"), col("rank"))
  }
}
