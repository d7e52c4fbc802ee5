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

  override val queries: Seq[GraftQuery] = Seq(dsirWeights, dsirSelect)
}
