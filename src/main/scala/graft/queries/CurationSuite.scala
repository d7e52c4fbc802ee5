package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** End-to-end training-data curation pipeline — the composition the
  * engine exists for: quality-filter → exact-dedup → join embeddings →
  * per-language corpus stats, as ONE lazy plan, fully oracle-checked.
  *
  * Shape at 100 TB: quality scoring is codegen'd per-row work on the
  * scan; dedup shuffles once on the content hash; the embedding join
  * shuffles on the id; the final agg is partial+final. Nothing touches
  * the driver.
  */
object CurationSuite extends QuerySuite {

  private val toksSql =
    """list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"""

  // DuckDB twin of TextFunctions.qualityScore (same operation order)
  private val qualitySql =
    s"""greatest(0.0,
          least(1.0, CAST(len($toksSql) AS DOUBLE) / 100.0) * 0.5 +
          least(1.0,
            (CASE WHEN len($toksSql) = 0 THEN 0.0
                  ELSE CAST(len(list_filter($toksSql, x -> x IN
                    ('the','a','an','and','of','to','in','is','it','that')))
                    AS DOUBLE) / CAST(len($toksSql) AS DOUBLE) END) * 5.0)
            * 0.5 -
          (CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(length(text) -
                  length(regexp_replace(text, '[[:punct:]]', '', 'g'))
                  AS DOUBLE) / CAST(length(text) AS DOUBLE) END))"""

  private val curation = GraftQuery(
    "q_curation_pipeline",
    (s, d) => {
      // tokenize ONCE into a column; quality scoring and the dedup
      // fingerprint both consume it (tokens dominate per-doc cost)
      val docs = documents(s, d)
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .withColumn("quality",
          TextFunctions.qualityScoreTokens(col("toks"), col("text")))
        .filter(col("quality") >= 0.3)
      val deduped = Dedup.dropDuplicatesByKey(docs,
        TextFunctions.exactFingerprintTokens(col("toks")), "doc_id")
      val joined = deduped.join(
        embeddings(s, d).select(
          col("vec_id").as("doc_id"),
          Similarity.asDouble(col("embedding")).as("v")),
        "doc_id")
      joined
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg("quality"), 6).as("avg_quality"),
          round(avg(col("n_chars").cast("double")), 4).as("avg_chars"),
          round(avg(sqrt(Similarity.norm2(col("v")))), 6).as("avg_norm"))
        .orderBy(asc("lang"))
    },
    Some(s"""WITH q AS (
               SELECT doc_id, lang, text, n_chars, $qualitySql AS quality
               FROM documents),
             kept AS (SELECT * FROM q WHERE quality >= 0.3),
             keepers AS (
               SELECT MIN(doc_id) AS doc_id FROM kept
               GROUP BY md5(array_to_string($toksSql, ' '))),
             joined AS (
               SELECT k.lang, k.quality, k.n_chars,
                 CAST(e.embedding AS DOUBLE[]) AS v
               FROM kept k
               JOIN keepers USING (doc_id)
               JOIN embeddings e ON k.doc_id = e.vec_id)
             SELECT lang, COUNT(*) AS n_docs,
               ROUND(AVG(quality), 6) AS avg_quality,
               ROUND(AVG(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
               ROUND(AVG(sqrt(list_sum(list_transform(v, x -> x * x)))), 6)
                 AS avg_norm
             FROM joined GROUP BY lang ORDER BY lang"""),
    headline = true)

  override val queries: Seq[GraftQuery] = Seq(curation)
}
