package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions
import graft.operators.Dsir

/** DSIR data selection (Xie et al. 2023) — importance weights of every
  * raw doc against a target slice, and the Gumbel-top-k resample.
  *
  * Target = sources src0/src1 (10% of the corpus): the "make the raw
  * crawl look like the curated slice" axis. The whole pipeline —
  * md5-bucket featurization, smoothed distributions, llr scoring,
  * content-keyed Gumbel noise — is pure content arithmetic, so the
  * DuckDB oracle replays it exactly; log_weight is rounded 6 dp BEFORE
  * the resample so cross-engine summation-order noise cannot reorder
  * the top-k margin.
  */
object SelectionSuite extends QuerySuite {

  private val B = 1024
  private val toksSql =
    """list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"""

  /** Shared oracle prefix: per-doc weights as Dsir.importanceWeights. */
  private val weightsSql =
    s"""WITH t AS (
          SELECT doc_id, source, $toksSql AS toks FROM documents
          WHERE len($toksSql) >= 1),
        feats AS (
          SELECT doc_id, source, unnest(toks) AS ng FROM t
          UNION ALL
          SELECT doc_id, source, toks[i] || ' ' || toks[i + 1] AS ng
          FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
          WHERE len(toks) >= 2),
        fb AS (
          SELECT doc_id, source,
            ('0x' || substr(md5(ng), 1, 8))::BIGINT % $B AS bucket
          FROM feats),
        tgt AS (SELECT bucket FROM fb WHERE source IN ('src0', 'src1')),
        ct AS (SELECT bucket, COUNT(*) AS c_t FROM tgt GROUP BY 1),
        cr AS (SELECT bucket, COUNT(*) AS c_r FROM fb GROUP BY 1),
        nt AS (SELECT COUNT(*) AS n_t FROM tgt),
        nr AS (SELECT COUNT(*) AS n_r FROM fb),
        llr AS (
          SELECT cr.bucket,
            ln((COALESCE(ct.c_t, 0) + 1.0) / (nt.n_t + $B.0))
              - ln((cr.c_r + 1.0) / (nr.n_r + $B.0)) AS llr
          FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN nt CROSS JOIN nr),
        w AS (
          SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_features,
            ROUND(SUM(l.llr), 6) AS log_weight
          FROM fb f JOIN llr l USING (bucket) GROUP BY 1)"""

  private def weightsDf(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("source"),
              TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
    Dsir.importanceWeights(
      raw = docs,
      target = docs.filter(col("source").isin("src0", "src1")),
      idCol = "doc_id", toksCol = "toks", numBuckets = B)
  }

  private val dsirWeights = GraftQuery(
    "q_dsir_weights",
    (s, d) => weightsDf(s, d).orderBy(asc("doc_id")),
    Some(s"""$weightsSql
            SELECT doc_id, n_features, log_weight FROM w ORDER BY doc_id"""),
    headline = true)

  private val dsirSelect = GraftQuery(
    "q_dsir_select",
    (s, d) => Dsir.resampleTopK(weightsDf(s, d), "doc_id", "log_weight",
        k = 50).select(col("doc_id"), col("score")),
    Some(s"""$weightsSql,
            sel AS (
              SELECT doc_id,
                ROUND(log_weight + -ln(-ln(
                  (('0x' || substr(md5(doc_id::VARCHAR || ':dsir'), 1, 8))
                     ::BIGINT + 0.5) / 4294967296.0)), 6) AS score
              FROM w)
            SELECT doc_id, score FROM sel
            ORDER BY score DESC, doc_id LIMIT 50"""))

  // ---- CCNet-style perplexity bucketing ------------------------------
  // Tercile thresholds come from percentile_disc SCALARS (two values,
  // broadcast) — never a corpus-wide ntile sort: at 100 TB the banding
  // pass is a scan + broadcast compare, which is why CCNet itself bins
  // against precomputed cutoffs. percentile_disc ↔ quantile_disc
  // cross-engine semantics are already pinned by q_percentile_disc.
  private val lmSql =
    s"""t AS (
          SELECT doc_id, $toksSql AS toks FROM documents
          WHERE len($toksSql) >= 2),
        bg AS (
          SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
          FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)),
        c2 AS (SELECT w1, w2, COUNT(*) AS c_bg FROM bg GROUP BY 1, 2),
        c1 AS (SELECT w1, COUNT(*) AS c_w1 FROM bg GROUP BY 1),
        v AS (SELECT COUNT(DISTINCT tok) AS v
              FROM (SELECT unnest(toks) AS tok FROM t)),
        scored AS (
          SELECT b.doc_id, ln((c2.c_bg + 1.0) / (c1.c_w1 + v.v)) AS lp
          FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
          CROSS JOIN v),
        w AS (
          SELECT doc_id, ROUND(EXP(-AVG(lp)), 6) AS ppl
          FROM scored GROUP BY doc_id)"""

  private val pplBuckets = GraftQuery(
    "q_ppl_buckets",
    (s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
      graft.operators.NgramLm.scoreBigramLm(t, "doc_id", "toks")
        .select(col("doc_id"), col("ppl"))
        .createOrReplaceTempView("ppl_scored")
      s.sql("""WITH th AS (
                 SELECT
                   percentile_disc(0.3333333) WITHIN GROUP (ORDER BY ppl)
                     AS t1,
                   percentile_disc(0.6666667) WITHIN GROUP (ORDER BY ppl)
                     AS t2
                 FROM ppl_scored),
               banded AS (
                 SELECT s.doc_id, s.ppl,
                   CASE WHEN s.ppl <= th.t1 THEN 'head'
                        WHEN s.ppl <= th.t2 THEN 'middle'
                        ELSE 'tail' END AS band
                 FROM ppl_scored s CROSS JOIN th)
               SELECT band, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 ROUND(AVG(ppl), 6) AS avg_ppl,
                 ROUND(MIN(ppl), 6) AS min_ppl,
                 ROUND(MAX(ppl), 6) AS max_ppl
               FROM banded GROUP BY band ORDER BY band""")
    },
    Some(s"""WITH $lmSql,
            th AS (
              SELECT quantile_disc(ppl, 0.3333333) AS t1,
                     quantile_disc(ppl, 0.6666667) AS t2
              FROM w),
            banded AS (
              SELECT w.doc_id, w.ppl,
                CASE WHEN w.ppl <= th.t1 THEN 'head'
                     WHEN w.ppl <= th.t2 THEN 'middle'
                     ELSE 'tail' END AS band
              FROM w CROSS JOIN th)
            SELECT band, CAST(COUNT(*) AS BIGINT) AS n_docs,
              ROUND(AVG(ppl), 6) AS avg_ppl,
              ROUND(MIN(ppl), 6) AS min_ppl,
              ROUND(MAX(ppl), 6) AS max_ppl
            FROM banded GROUP BY band ORDER BY band"""))

  // ---- temperature-based mixture resampling --------------------------
  // The corpus' sources are uniform, so a skewed stratum (60/30/10 by
  // doc_id band) is derived in-query; α=0.5 flattens it toward the
  // sqrt distribution. The oracle replays the rate arithmetic and the
  // md5-uniform row filter exactly.
  private val stratCase =
    """CASE WHEN doc_id % 100 < 60 THEN 'big'
            WHEN doc_id % 100 < 90 THEN 'mid'
            ELSE 'small' END"""

  private val temperatureMix = GraftQuery(
    "q_temperature_mix",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 100 < 60, lit("big"))
          .when(col("doc_id") % 100 < 90, lit("mid"))
          .otherwise(lit("small")).as("strat"))
      val rates = graft.operators.Sampling.temperatureMixRates(
        docs, "strat", alpha = 0.5, budget = 1000L)
      val sampled = graft.operators.Sampling.temperatureSample(
          docs, "strat", "doc_id", rates)
        .groupBy("strat").agg(count(lit(1)).as("n_selected"))
      rates.join(sampled, Seq("strat"), "left")
        .select(col("strat"), col("n_rows"), col("rate"),
          coalesce(col("n_selected"), lit(0L)).as("n_selected"))
        .orderBy(asc("strat"))
    },
    Some(s"""WITH docs AS (
              SELECT doc_id, $stratCase AS strat FROM documents),
            counts AS (
              SELECT strat, COUNT(*) AS n_rows,
                pow(COUNT(*), 0.5) AS w
              FROM docs GROUP BY 1),
            total AS (SELECT SUM(w) AS sw FROM counts),
            rates AS (
              SELECT strat, n_rows,
                ROUND(LEAST(1.0, 1000.0 * w / total.sw / n_rows), 6)
                  AS rate
              FROM counts CROSS JOIN total),
            sampled AS (
              SELECT d.strat, COUNT(*) AS n_selected
              FROM docs d JOIN rates r USING (strat)
              WHERE (('0x' || substr(md5(d.doc_id::VARCHAR || ':tmix'),
                1, 8))::BIGINT + 0.5) / 4294967296.0 < r.rate
              GROUP BY 1)
            SELECT r.strat, CAST(r.n_rows AS BIGINT) AS n_rows, r.rate,
              CAST(COALESCE(s.n_selected, 0) AS BIGINT) AS n_selected
            FROM rates r LEFT JOIN sampled s USING (strat)
            ORDER BY r.strat"""))

  override val queries: Seq[GraftQuery] =
    Seq(dsirWeights, dsirSelect, pplBuckets, temperatureMix)
}
