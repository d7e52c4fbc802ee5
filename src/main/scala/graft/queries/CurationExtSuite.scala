package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions
import graft.operators.{LinearClassifier, LineDedup, NbClassifier, NgramLm, SpanDedup}
import graft.functions.FoldText
import graft.plans.GraftFunctions

/** Second curation wave: line-level boilerplate dedup (CCNet's first
  * pass) and bigram-LM quality scoring (CCNet's perplexity axis) — both
  * DuckDB-oracled end-to-end.
  *
  * The testdata documents are single-line word streams, so the line
  * gate builds a multi-line corpus deterministically IN-QUERY (the same
  * plant-structure pattern the dedup gates use): 10-token chunks as
  * content lines, plus a corpus-wide header line and a per-source
  * footer line as known boilerplate. Both engines run the identical
  * construction, so the oracle pins the full trade: boilerplate lines
  * (df ≥ threshold) dropped everywhere, content lines untouched.
  */
object CurationExtSuite extends QuerySuite {

  private val toksSql =
    """list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"""

  // ---- line-level exact dedup (boilerplate removal) ------------------
  private val lineDedup = GraftQuery(
    "q_line_dedup",
    (s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), col("source"),
                TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 1)
      val nChunks = ceil(size(col("toks")).cast("double") / 10.0).cast("int")
      val chunks = transform(sequence(lit(0), nChunks - 1),
        g => concat_ws(" ", slice(col("toks"), g * 10 + 1, lit(10))))
      val built = t.select(col("doc_id"),
        array_join(
          concat(
            array(lit("shared boilerplate header")),
            chunks,
            array(concat(lit("footer for "), col("source")))),
          "\n").as("text"))
      LineDedup.dropCommonLines(built, "doc_id", "text", minDocFreq = 5L)
        .select(col("doc_id"), col("n_lines"), col("n_dropped"),
                md5(col("clean_text")).as("clean_fp"))
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, source, $toksSql AS toks FROM documents
               WHERE len($toksSql) >= 1),
             built AS (
               SELECT doc_id,
                 'shared boilerplate header' || chr(10) ||
                 array_to_string(list_transform(
                   generate_series(0, CAST(ceil(len(toks) / 10.0) AS INT) - 1),
                   g -> array_to_string(
                          list_slice(toks, g * 10 + 1, g * 10 + 10), ' ')),
                   chr(10)) ||
                 chr(10) || 'footer for ' || source AS text
               FROM t),
             sp AS (
               SELECT doc_id, string_split(text, chr(10)) AS ls FROM built),
             lines AS (
               SELECT doc_id, i AS pos, ls[i] AS line
               FROM sp, unnest(generate_series(1, len(ls))) AS u(i)),
             freq AS (
               SELECT md5(line) AS k, COUNT(DISTINCT doc_id) AS line_df
               FROM lines GROUP BY 1),
             flagged AS (
               SELECT l.doc_id, l.pos, l.line,
                 CASE WHEN f.line_df >= 5 THEN 1 ELSE 0 END AS dropped
               FROM lines l JOIN freq f ON md5(l.line) = f.k)
             SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(dropped) AS BIGINT) AS n_dropped,
               md5(COALESCE(string_agg(line, chr(10) ORDER BY pos)
                 FILTER (WHERE dropped = 0), '')) AS clean_fp
             FROM flagged GROUP BY doc_id ORDER BY doc_id"""),
    headline = true)

  // ---- bigram-LM quality scoring -------------------------------------
  private val lmScore = GraftQuery(
    "q_lm_score",
    (s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
      NgramLm.scoreBigramLm(t, "doc_id", "toks")
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH t AS (
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
               SELECT b.doc_id,
                 ln((c2.c_bg + 1.0) / (c1.c_w1 + v.v)) AS lp
               FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
               CROSS JOIN v)
             SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(AVG(lp), 6) AS avg_logprob,
               ROUND(EXP(-AVG(lp)), 6) AS ppl
             FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  // ---- Kneser-Ney bigram-LM quality scoring --------------------------
  // The interpolated-KN rendition of q_lm_score (the smoothing KenLM /
  // the CCNet filter actually uses): discounted ML term + continuation
  // back-off, D = 0.75. Every scored bigram is in the training counts,
  // so the discounted term is strictly positive and the whole formula
  // replays exactly in SQL.
  private val lmKn = GraftQuery(
    "q_lm_kn",
    (s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
      NgramLm.scoreBigramKn(t, "doc_id", "toks", discount = 0.75)
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, $toksSql AS toks FROM documents
               WHERE len($toksSql) >= 2),
             bg AS (
               SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
               FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)),
             c2 AS (SELECT w1, w2, COUNT(*) AS c_bg FROM bg GROUP BY 1, 2),
             c1 AS (SELECT w1, COUNT(*) AS c_w1 FROM bg GROUP BY 1),
             na AS (SELECT w1, COUNT(*) AS n_after FROM c2 GROUP BY 1),
             nb AS (SELECT w2, COUNT(*) AS n_before FROM c2 GROUP BY 1),
             nt AS (SELECT COUNT(*) AS n_types FROM c2),
             scored AS (
               SELECT b.doc_id,
                 ln((c2.c_bg - 0.75) / c1.c_w1 +
                    0.75 * na.n_after / c1.c_w1 *
                      (nb.n_before / CAST(nt.n_types AS DOUBLE))) AS lp
               FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
                 JOIN na USING (w1) JOIN nb USING (w2)
               CROSS JOIN nt)
             SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(AVG(lp), 6) AS avg_logprob,
               ROUND(EXP(-AVG(lp)), 6) AS ppl
             FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  // ---- trigram Kneser-Ney LM scoring ----------------------------------
  // Order-3 interpolated KN with PROPER continuation counts: the bigram
  // level is estimated from trigram TYPE counts (N1+(·w2w3) etc.), not
  // bigram instances — the Chen & Goodman detail naive backoff gets
  // wrong. One corpus-sized aggregation (the c3 type table); every
  // other table derives from it.
  private val lmTrigramKn = GraftQuery(
    "q_lm_trigram_kn",
    (s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
      NgramLm.scoreTrigramKn(t, "doc_id", "toks", discount = 0.75)
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, $toksSql AS toks FROM documents
               WHERE len($toksSql) >= 3),
             tg AS (
               SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2,
                      toks[i + 2] AS w3
               FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i)),
             c3 AS (SELECT w1, w2, w3, COUNT(*) AS c_tg
                    FROM tg GROUP BY 1, 2, 3),
             ch AS (SELECT w1, w2, SUM(c_tg) AS c_hist, COUNT(*) AS n_h
                    FROM c3 GROUP BY 1, 2),
             hat2 AS (SELECT w2, w3, COUNT(*) AS chat FROM c3 GROUP BY 1, 2),
             d2 AS (SELECT w2, SUM(chat) AS den2, COUNT(*) AS nf2
                    FROM hat2 GROUP BY 1),
             p1 AS (SELECT w3, COUNT(*) AS npre FROM hat2 GROUP BY 1),
             nt AS (SELECT COUNT(*) AS n_types FROM hat2),
             scored AS (
               SELECT g.doc_id,
                 ln((c3.c_tg - 0.75) / ch.c_hist +
                    0.75 * ch.n_h / ch.c_hist *
                      ((hat2.chat - 0.75) / d2.den2 +
                       0.75 * d2.nf2 / d2.den2 *
                         (p1.npre / CAST(nt.n_types AS DOUBLE)))) AS lp
               FROM tg g JOIN c3 USING (w1, w2, w3) JOIN ch USING (w1, w2)
                 JOIN hat2 USING (w2, w3) JOIN d2 USING (w2)
                 JOIN p1 USING (w3)
               CROSS JOIN nt)
             SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
               ROUND(AVG(lp), 6) AS avg_logprob,
               ROUND(EXP(-AVG(lp)), 6) AS ppl
             FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  // ---- duplicated-substring span coverage ----------------------------
  // Suffix-array-dedup proxy (Lee et al. 2021): fraction of each doc's
  // tokens inside an 8-gram shared verbatim with another doc. The base
  // corpus has no natural 8-gram collisions (tiny vocab, random
  // streams), so a 12-token passage is planted onto every 10th doc —
  // the oracle then pins both sides: planted docs cover exactly the
  // passage, everything else reads 0.
  private val plantedPassage = "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10 zq11 zq12"

  private val spanCoverage = GraftQuery(
    "q_dup_span_coverage",
    (s, d) => {
      val planted = documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" " + plantedPassage)))
          .otherwise(col("text")).as("text"))
      val t = planted.select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("toks"))
      SpanDedup.dupSpanCoverage(t, "doc_id", "toks", k = 8)
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH planted AS (
               SELECT doc_id,
                 CASE WHEN doc_id % 10 = 0
                      THEN text || ' $plantedPassage'
                      ELSE text END AS text
               FROM documents),
             t AS (
               SELECT doc_id, $toksSql AS toks FROM planted
               WHERE len($toksSql) >= 8),
             grams AS (
               SELECT doc_id, i AS pos,
                 md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS gk
               FROM t, unnest(generate_series(1, len(toks) - 7)) AS u(i)),
             dup AS (
               SELECT gk FROM grams GROUP BY gk
               HAVING COUNT(DISTINCT doc_id) >= 2),
             cov AS (
               SELECT g.doc_id, COUNT(DISTINCT ci) AS covered_tokens
               FROM grams g JOIN dup USING (gk),
                 unnest(generate_series(g.pos, g.pos + 7)) AS c(ci)
               GROUP BY g.doc_id),
             base AS (SELECT doc_id, len(toks) AS n_tokens FROM t)
             SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
               CAST(COALESCE(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
               ROUND(CAST(COALESCE(c.covered_tokens, 0) AS DOUBLE) /
                 b.n_tokens, 6) AS coverage
             FROM base b LEFT JOIN cov c USING (doc_id)
             ORDER BY b.doc_id"""))

  // ---- exact-substring dedup by excision (full Lee et al. op) -------
  // Same planted construction as q_dup_span_coverage; the keeper doc
  // (minimal planted doc_id) keeps its passage byte-identical, every
  // other planted doc loses exactly the passage positions. The oracle
  // pins counts AND the reassembled-text md5 per doc.
  private val spanRemoval = GraftQuery(
    "q_span_removal",
    (s, d) => {
      val planted = documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" " + plantedPassage)))
          .otherwise(col("text")).as("text"))
      val t = planted.select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 1)
      SpanDedup.removeDupSpans(t, "doc_id", "toks", k = 8)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
                md5(col("clean_text")).as("clean_fp"))
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH planted AS (
               SELECT doc_id,
                 CASE WHEN doc_id % 10 = 0
                      THEN text || ' $plantedPassage'
                      ELSE text END AS text
               FROM documents),
             t AS (
               SELECT doc_id, $toksSql AS toks FROM planted
               WHERE len($toksSql) >= 1),
             grams AS (
               SELECT doc_id, i AS pos,
                 md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS gk
               FROM t, unnest(generate_series(1, len(toks) - 7)) AS u(i)
               WHERE len(toks) >= 8),
             dup AS (
               SELECT gk, MIN(doc_id) AS keeper FROM grams GROUP BY gk
               HAVING COUNT(DISTINCT doc_id) >= 2),
             rm AS (
               SELECT DISTINCT g.doc_id, ci
               FROM grams g JOIN dup USING (gk),
                 unnest(generate_series(g.pos, g.pos + 7)) AS c(ci)
               WHERE g.doc_id <> dup.keeper),
             rmn AS (
               SELECT doc_id, COUNT(*) AS n_removed FROM rm GROUP BY 1),
             toks AS (
               SELECT doc_id, i AS ci, toks[i] AS tok
               FROM t, unnest(generate_series(1, len(toks))) AS u(i)),
             clean AS (
               SELECT tk.doc_id,
                 COALESCE(string_agg(tk.tok, ' ' ORDER BY tk.ci)
                   FILTER (WHERE r.ci IS NULL), '') AS clean_text
               FROM toks tk LEFT JOIN rm r
                 ON tk.doc_id = r.doc_id AND tk.ci = r.ci
               GROUP BY 1)
             SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
               CAST(COALESCE(rmn.n_removed, 0) AS BIGINT) AS n_removed,
               md5(COALESCE(c.clean_text, '')) AS clean_fp
             FROM t LEFT JOIN rmn USING (doc_id)
               LEFT JOIN clean c USING (doc_id)
             ORDER BY t.doc_id"""))

  // ---- fixed-size token chunking with overlap ------------------------
  // size=64, overlap=16 (stride 48): per-chunk rows with text md5 —
  // the oracle replays the start-position contract exactly.
  private val tokenChunks = GraftQuery(
    "q_token_chunks",
    (s, d) => {
      val t = documents(s, d).select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("toks"))
      graft.operators.Chunking.chunkTokens(t, "doc_id", "toks",
          size = 64, overlap = 16)
        .select(col("doc_id"), col("chunk_id"), col("start_pos"),
          col("n_chunk_tokens"), md5(col("chunk_text")).as("chunk_fp"))
        .orderBy(asc("doc_id"), asc("chunk_id"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, $toksSql AS toks FROM documents
               WHERE len($toksSql) >= 1),
             c AS (
               SELECT doc_id, j AS chunk_id, j * 48 + 1 AS start_pos,
                 list_slice(toks, j * 48 + 1, j * 48 + 64) AS ctoks
               FROM t, unnest(generate_series(0,
                 CAST(floor((greatest(1, len(toks) - 16) - 1) / 48.0)
                   AS INT))) AS u(j))
             SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
               CAST(start_pos AS INT) AS start_pos,
               CAST(len(ctoks) AS BIGINT) AS n_chunk_tokens,
               md5(array_to_string(ctoks, ' ')) AS chunk_fp
             FROM c ORDER BY doc_id, chunk_id"""))

  // ---- winnowing fingerprints (Schleimer et al. 2003 / MOSS) ---------
  // k=5 grams, w=4 windows; the whole selection is in-row arithmetic,
  // so the oracle replays gram hashing, window minima, and the sorted
  // distinct digest byte-for-byte.
  private val winnowFp = GraftQuery(
    "q_winnow_fingerprint",
    (s, d) => {
      val t = documents(s, d).select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("toks"))
      graft.operators.Winnow.fingerprints(t, "doc_id", "toks",
          k = 5, w = 4)
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, $toksSql AS toks FROM documents
               WHERE len($toksSql) >= 5),
             g AS (
               SELECT doc_id,
                 list_transform(generate_series(1, len(toks) - 4),
                   i -> ('0x' || substr(md5(array_to_string(
                     list_slice(toks, i, i + 4), ' ')), 1, 8))::BIGINT)
                   AS gh
               FROM t),
             f AS (
               SELECT doc_id, len(gh) AS n_grams,
                 list_distinct(list_transform(
                   generate_series(1, greatest(1, len(gh) - 3)),
                   p -> list_aggregate(list_slice(gh, p, p + 3), 'min')))
                   AS fps
               FROM g)
             SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
               CAST(len(fps) AS BIGINT) AS n_fps,
               md5(array_to_string(list_sort(fps), ' ')) AS fp_digest
             FROM f ORDER BY doc_id"""))

  // ---- winnowing match step (MOSS candidate pairs) -------------------
  // A 16-token passage planted on every 100th doc: each planted pair
  // shares the passage-interior window minima (≥ ceil(9/4) = 3 distinct
  // by the window-membership bound), so minShared=2 catches all planted
  // pairs; the oracle replays selection, skew guard, and pair counting.
  private val winnowPassage =
    "wn1 wn2 wn3 wn4 wn5 wn6 wn7 wn8 wn9 wn10 wn11 wn12 wn13 wn14 wn15 wn16"

  private val winnowPairs = GraftQuery(
    "q_winnow_pairs",
    (s, d) => {
      val planted = documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 100 === 0,
          concat(col("text"), lit(" " + winnowPassage)))
          .otherwise(col("text")).as("text"))
      val t = planted.select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("toks"))
      graft.operators.Winnow.sharedFingerprintPairs(t, "doc_id", "toks",
          k = 5, w = 4, minShared = 2, maxBucket = 200L)
        .orderBy(asc("id_a"), asc("id_b"))
    },
    Some(s"""WITH planted AS (
               SELECT doc_id,
                 CASE WHEN doc_id % 100 = 0
                      THEN text || ' $winnowPassage'
                      ELSE text END AS text
               FROM documents),
             t AS (
               SELECT doc_id, $toksSql AS toks FROM planted
               WHERE len($toksSql) >= 5),
             g AS (
               SELECT doc_id,
                 list_transform(generate_series(1, len(toks) - 4),
                   i -> ('0x' || substr(md5(array_to_string(
                     list_slice(toks, i, i + 4), ' ')), 1, 8))::BIGINT)
                   AS gh
               FROM t),
             f AS (
               SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, greatest(1, len(gh) - 3)),
                   p -> list_aggregate(list_slice(gh, p, p + 3), 'min')))
                   AS fps
               FROM g),
             ex AS (SELECT doc_id, unnest(fps) AS fp FROM f),
             ok AS (
               SELECT fp FROM ex GROUP BY fp
               HAVING COUNT(*) BETWEEN 2 AND 200),
             p AS (SELECT doc_id, fp FROM ex JOIN ok USING (fp))
             SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(DISTINCT a.fp) AS BIGINT) AS shared_fps
             FROM p a JOIN p b ON a.fp = b.fp AND a.doc_id < b.doc_id
             GROUP BY 1, 2 HAVING COUNT(DISTINCT a.fp) >= 2
             ORDER BY 1, 2"""))

  // ---- pretraining sequence-prep pipeline (composition gate) ---------
  // The back half of a training-data pipeline as ONE lazy plan:
  // quality-filter → fold-key exact dedup → GPT-style fixed-length
  // packing over the SURVIVING id-ordered stream. Each stage is
  // individually gated elsewhere (q_curation_pipeline, q_fold_dedup,
  // q_pack_sequences); this gate pins that they COMPOSE — the packing
  // offsets are over the post-filter post-dedup corpus, so any drift in
  // an upstream stage moves every downstream offset.
  //
  // DuckDB twin of TextFunctions.qualityScoreTokens (same operation
  // order as q_curation_pipeline's proven oracle).
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

  /** Quality-filtered corpus, tokenized ONCE and lineage-cut with the
    * filters ABOVE the barrier (r18 pushed-predicate sweep, VERDICT
    * r17 #8). Written the natural way — filter after withColumn —
    * Catalyst pushes `size(toks) >= 1 AND quality >= 0.3` through both
    * projections to the parquet scan, substituting the full
    * tokenize into every reference: up to six interpreted
    * re-derivations per row (HOF predicates are CodegenFallback, no
    * codegen subexpression elimination), repeated per union branch in
    * the consumers. The cut materializes (toks, quality) once and the
    * filter above it reads columns for free — the SetSimJoin r17 /
    * percolateShingled recipe. The added `size >= 1` is a no-op for
    * callers that only filtered on quality (zero tokens ⇒ quality ≤ 0).
    */
  private def qualityDocs(s: org.apache.spark.sql.SparkSession,
                          d: String) =
    graft.plans.Lineage.cut(documents(s, d)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("quality",
        TextFunctions.qualityScoreTokens(col("toks"), col("text"))))
      .filter(size(col("toks")) >= 1 && col("quality") >= 0.3)

  private val pretrainPipeline = GraftQuery(
    "q_pretrain_pipeline",
    (s, d) => {
      GraftFunctions.register(s)
      val docs = qualityDocs(s, d)
      // fold-key exact dedup, keeper = min doc_id per folded fingerprint
      val keepers = docs
        .select(col("doc_id"), md5(FoldText.fold_text(col("text"))).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      // Cut the dedup survivors (r19, the q_llm_data_pipeline packing
      // boundary): packFixedLength's repartitionByRange samples its
      // child for range bounds — uncut, the fold-key groupBy +
      // semi-join recompute for the sampling pass and again for the
      // real exchange. The cut (survivor id + text, a row-subset of
      // the already-cut qualityDocs) runs the dedup once.
      val deduped = graft.plans.Lineage.cut(
        docs.join(keepers, Seq("doc_id"), "left_semi")
          .select("doc_id", "text"))
      graft.operators.Packing.packFixedLength(deduped, seqLen = 512L)
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH q AS (
               SELECT doc_id, text, $qualitySql AS quality FROM documents),
             kept AS (SELECT doc_id, text FROM q WHERE quality >= 0.3),
             keepers AS (
               SELECT MIN(doc_id) AS doc_id FROM kept
               GROUP BY md5(strip_accents(nfc_normalize(lower(text))))),
             t AS (
               SELECT k.doc_id, len($toksSql) AS n_tokens
               FROM kept k JOIN keepers USING (doc_id)),
             c AS (
               SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS g_start
               FROM t WHERE n_tokens >= 1)
             SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(g_start AS BIGINT) AS g_start,
               CAST(g_start // 512 AS BIGINT) AS first_seq,
               CAST((g_start + n_tokens - 1) // 512 AS BIGINT) AS last_seq,
               CAST((g_start + n_tokens - 1) // 512 - g_start // 512 + 1
                 AS BIGINT) AS n_seqs
             FROM c ORDER BY doc_id"""))

  // ---- unicode case/diacritic folding (custom codegen expression) ----
  // The corpus is pure lowercase ASCII (fold = identity there), so the
  // gate plants accented/uppercase strings on every 50th doc; the
  // DuckDB contract is strip_accents(nfc_normalize(lower(x))), pinned
  // byte-for-byte via md5. 'İ' exercises the lower→combining-dot→strip
  // path; 'straße'/'ĐÔNG' pin the non-mark letters folding must NOT
  // touch.
  private val accented =
    "Café NAÏVE Zürich São ÉLÈVE " +
    "niño İstanbul ĐÔNG straße"

  private val textFold = GraftQuery(
    "q_text_fold",
    (s, d) => {
      GraftFunctions.register(s)
      val planted = documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 50 === 0,
          concat(col("text"), lit(" " + accented)))
          .otherwise(col("text")).as("text"))
      planted
        .select(col("doc_id"), FoldText.fold_text(col("text")).as("folded"))
        .select(col("doc_id"),
          length(col("folded")).cast("long").as("n_chars_folded"),
          md5(col("folded")).as("fold_fp"))
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH planted AS (
               SELECT doc_id,
                 CASE WHEN doc_id % 50 = 0 THEN text || ' $accented'
                      ELSE text END AS text
               FROM documents),
             f AS (
               SELECT doc_id,
                 strip_accents(nfc_normalize(lower(text))) AS folded
               FROM planted)
             SELECT doc_id,
               CAST(length(folded) AS BIGINT) AS n_chars_folded,
               md5(folded) AS fold_fp
             FROM f ORDER BY doc_id"""))

  // ---- Naive-Bayes quality classifier (train = aggregate) ------------
  // The fastText-style keep/drop classifier axis, in its deterministic
  // NB form. Labels and class markers are planted in-query (y = doc_id
  // mod 2, marker token appended twice), both engines train on the same
  // corpus, and the oracle re-states the full add-one model — priors,
  // word-class counts, smoothing — so log-odds match to 6 dp and the
  // predicted label derives from the ROUNDED value in both engines.
  private val nbClassify = GraftQuery(
    "q_nb_classify",
    (s, d) => {
      val planted = documents(s, d).select(col("doc_id"),
        (col("doc_id") % 2).cast("int").as("y"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0, lit(" mk0 mk0"))
            .otherwise(lit(" mk1 mk1"))).as("text"))
      val t = planted.select(col("doc_id"), col("y"),
          TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 1)
      NbClassifier.trainScoreBinary(t, "doc_id", "toks", "y")
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH planted AS (
               SELECT doc_id, CAST(doc_id % 2 AS INT) AS y,
                 text || CASE WHEN doc_id % 2 = 0 THEN ' mk0 mk0'
                              ELSE ' mk1 mk1' END AS text
               FROM documents),
             t AS (
               SELECT doc_id, y, $toksSql AS toks FROM planted
               WHERE len($toksSql) >= 1),
             tok AS (SELECT doc_id, y, unnest(toks) AS tok FROM t),
             wc AS (
               SELECT tok,
                 COUNT(*) FILTER (WHERE y = 0) AS c0,
                 COUNT(*) FILTER (WHERE y = 1) AS c1
               FROM tok GROUP BY tok),
             tot AS (
               SELECT COUNT(*) FILTER (WHERE y = 0) AS n0,
                 COUNT(*) FILTER (WHERE y = 1) AS n1,
                 COUNT(DISTINCT tok) AS v
               FROM tok),
             dc AS (
               SELECT COUNT(*) FILTER (WHERE y = 0) AS d0,
                 COUNT(*) FILTER (WHERE y = 1) AS d1
               FROM t),
             sc AS (
               SELECT k.doc_id, k.y, COUNT(*) AS n_tokens,
                 SUM(ln((wc.c0 + 1.0) / (tot.n0 + tot.v))) AS s0,
                 SUM(ln((wc.c1 + 1.0) / (tot.n1 + tot.v))) AS s1
               FROM tok k JOIN wc USING (tok) CROSS JOIN tot
               GROUP BY 1, 2)
             SELECT sc.doc_id, sc.y,
               CAST(sc.n_tokens AS BIGINT) AS n_tokens,
               ROUND(ln(CAST(dc.d1 AS DOUBLE) / dc.d0) + s1 - s0, 6)
                 AS log_odds,
               CASE WHEN ROUND(ln(CAST(dc.d1 AS DOUBLE) / dc.d0)
                      + s1 - s0, 6) > 0
                    THEN 1 ELSE 0 END AS pred_label
             FROM sc CROSS JOIN dc ORDER BY sc.doc_id"""),
    headline = true)

  // ---- fastText-shape linear quality classifier (trained, GD) -------
  // The TRAINED counterpart of q_nb_classify on the same planted axis:
  // hashed unigram+bigram features, two deterministic full-batch
  // logistic-GD steps with per-step 9-dp gradient rounding, so the
  // oracle replays TRAINING itself — both iterations unrolled as CTEs —
  // not just the scoring pass. B = 2048 keeps the planted marker's
  // bucket collision-free (B = 64 plateaus at ~0.8 accuracy, measured);
  // at this operating point 2 steps reach 1.0 train accuracy.
  private val linearClassify = GraftQuery(
    "q_linear_classify",
    (s, d) => {
      val planted = documents(s, d).select(col("doc_id"),
        (col("doc_id") % 2).cast("int").as("y"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0, lit(" mk0 mk0"))
            .otherwise(lit(" mk1 mk1"))).as("text"))
      val t = planted.select(col("doc_id"), col("y"),
          TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 1)
      LinearClassifier.trainScoreBinary(t, "doc_id", "toks", "y",
          numBuckets = 2048, iters = 2, lr = 5.0)
        .orderBy(asc("doc_id"))
    },
    Some(linearClassifyOracleSql),
    headline = true)

  // ---- classifier lifecycle: save after iter 1, warm-start iter 2 ----
  // The retrain-nightly shape: a stored model (version-stamped weight
  // table, bucket GEOMETRY in the stamp) warm-starts further training.
  // Training is deterministic, so one iteration + save + load + one
  // more iteration must equal two direct iterations EXACTLY — the gate
  // therefore reuses the identical 2-iteration q_linear_classify
  // oracle, and any storage-introduced drift (lost bits, wrong
  // geometry, reordered rows) breaks the hash.
  private val classifyStored = GraftQuery(
    "q_classify_stored",
    (s, d) => {
      val planted = documents(s, d).select(col("doc_id"),
        (col("doc_id") % 2).cast("int").as("y"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0, lit(" mk0 mk0"))
            .otherwise(lit(" mk1 mk1"))).as("text"))
      val t = planted.select(col("doc_id"), col("y"),
          TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 1)
      val path = s"${GateStates.dir}/" +
        s"linear_model_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      val (w1, _) = LinearClassifier.train(t, "doc_id", "toks", "y",
        numBuckets = 2048, iters = 1, lr = 5.0)
      LinearClassifier.saveModel(s, w1, path, numBuckets = 2048)
      val (loaded, b) = LinearClassifier.loadModel(s, path)
      val (w2, _) = LinearClassifier.train(t, "doc_id", "toks", "y",
        numBuckets = b, iters = 1, lr = 5.0, init = Some(loaded))
      LinearClassifier.scoreWith(t, "doc_id", "toks", "y", w2,
          numBuckets = b)
        .orderBy(asc("doc_id"))
    },
    Some(linearClassifyOracleSql))

  /** Shared by q_linear_classify, the streaming q_stream_classify
    * (AdvancedSuite), and q_classify_stored (warm-start lifecycle):
    * all three score under the SAME trained model, so their rows must
    * match this replay row-for-row.
    */
  private[queries] lazy val linearClassifyOracleSql: String =
    s"""$linearClassifyCtes
             SELECT doc_id, y, CAST(n_features AS BIGINT) AS n_features,
               score,
               CASE WHEN score > 0 THEN 1 ELSE 0 END AS pred_label
             FROM scored ORDER BY doc_id"""

  /** The training+scoring CTE chain alone (ends at `scored`) — the
    * multi-stage streaming ingest oracle (AdvancedSuite) extends it
    * with packing and manifest CTEs.
    */
  private[queries] lazy val linearClassifyCtes: String =
    s"""WITH planted AS (
               SELECT doc_id, CAST(doc_id % 2 AS INT) AS y,
                 text || CASE WHEN doc_id % 2 = 0 THEN ' mk0 mk0'
                              ELSE ' mk1 mk1' END AS text
               FROM documents),
             t AS (
               SELECT doc_id, y, $toksSql AS toks FROM planted
               WHERE len($toksSql) >= 1),
             base AS (
               SELECT doc_id, y, toks,
                 CAST(CASE WHEN len(toks) >= 2 THEN 2 * len(toks) - 1
                           ELSE len(toks) END AS DOUBLE) AS nf
               FROM t),
             ng AS (
               SELECT doc_id, y, nf, unnest(toks) AS ng FROM base
               UNION ALL
               SELECT doc_id, y, nf, toks[i] || ' ' || toks[i + 1] AS ng
               FROM base, unnest(generate_series(1, len(toks) - 1)) AS u(i)
               WHERE len(toks) >= 2),
             feats AS (
               SELECT doc_id, y,
                 ('0x' || substr(md5(ng), 1, 8))::BIGINT % 2048 AS bucket,
                 1.0 / nf AS x
               FROM ng
               UNION ALL
               SELECT doc_id, y, CAST(-1 AS BIGINT) AS bucket, 1.0 AS x
               FROM base),
             n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base),
             g1 AS (
               SELECT bucket, ROUND(SUM((0.5 - y) * x) / MAX(n.n), 9) AS g
               FROM feats CROSS JOIN n GROUP BY bucket),
             w1 AS (SELECT bucket, ROUND(-5.0 * g, 9) AS wt FROM g1),
             s2 AS (
               SELECT f.doc_id, MAX(f.y) AS y, SUM(w.wt * f.x) AS s
               FROM feats f JOIN w1 w USING (bucket) GROUP BY f.doc_id),
             r2 AS (
               SELECT doc_id, 1.0 / (1.0 + exp(-s)) - y AS r FROM s2),
             g2 AS (
               SELECT f.bucket, ROUND(SUM(r2.r * f.x) / MAX(n.n), 9) AS g
               FROM feats f JOIN r2 USING (doc_id) CROSS JOIN n
               GROUP BY f.bucket),
             w2 AS (
               SELECT w1.bucket,
                 ROUND(w1.wt - 5.0 * COALESCE(g2.g, 0.0), 9) AS wt
               FROM w1 LEFT JOIN g2 USING (bucket)),
             scored AS (
               SELECT f.doc_id, MAX(f.y) AS y,
                 SUM(CASE WHEN f.bucket >= 0 THEN 1 ELSE 0 END)
                   AS n_features,
                 ROUND(list_reduce(
                   list(w.wt * f.x ORDER BY f.bucket, w.wt * f.x),
                   (a, b) -> a + b), 6) AS score
               FROM feats f JOIN w2 w USING (bucket) GROUP BY f.doc_id)"""

  // ---- Platt calibration of a quality score ---------------------------
  // Post-hoc probability calibration (Platt 1999) over a deterministic
  // margin: s = ln(n_chars) against the imbalanced label n_chars > 500
  // (~8% positive — exactly where Platt's smoothed targets
  // t₊=(n₊+1)/(n₊+2), t₋=1/(n₋+2) differ from raw 0/1). Both GD steps
  // round gradients to 9 dp (the q_linear_classify convention), so the
  // whole fit — init b at the smoothed base-rate log-odds, two updates,
  // per-doc σ(a·s+b) — replays as oracle CTEs to full value equality.
  private val plattCalibrate = GraftQuery(
    "q_platt_calibrate",
    (s, d) => {
      val t = documents(s, d).select(col("doc_id"),
        log(col("n_chars").cast("double")).as("s"),
        (col("n_chars") > 500).cast("int").as("y"))
      val (a, b) = graft.operators.LinearClassifier
        .plattCalibrate(t, "s", "y", iters = 2, lr = 1.0)
      t.select(col("doc_id"), round(col("s"), 6).as("score"), col("y"),
          round(graft.operators.LinearClassifier
            .calibrated(col("s"), a, b), 6).as("p_cal"))
        .orderBy(asc("doc_id"))
    },
    Some("""WITH t AS (
              SELECT doc_id, ln(CAST(n_chars AS DOUBLE)) AS s,
                CASE WHEN n_chars > 500 THEN 1 ELSE 0 END AS y
              FROM documents),
            c AS (
              SELECT CAST(SUM(y) AS DOUBLE) AS np,
                     CAST(SUM(1 - y) AS DOUBLE) AS nn,
                     CAST(COUNT(*) AS DOUBLE) AS n
              FROM t),
            tt AS (
              SELECT doc_id, s,
                CASE WHEN y = 1 THEN (np + 1.0) / (np + 2.0)
                     ELSE 1.0 / (nn + 2.0) END AS tgt
              FROM t CROSS JOIN c),
            i0 AS (
              SELECT 0.0 AS a, ROUND(ln((np + 1.0) / (nn + 1.0)), 9) AS b
              FROM c),
            g1 AS (
              SELECT
                ROUND(SUM((1.0/(1.0+exp(-(a*s+b))) - tgt) * s) / MAX(n), 9) AS ga,
                ROUND(SUM(1.0/(1.0+exp(-(a*s+b))) - tgt) / MAX(n), 9) AS gb
              FROM tt CROSS JOIN i0 CROSS JOIN c),
            i1 AS (
              SELECT ROUND(a - ga, 9) AS a, ROUND(b - gb, 9) AS b
              FROM i0 CROSS JOIN g1),
            g2 AS (
              SELECT
                ROUND(SUM((1.0/(1.0+exp(-(a*s+b))) - tgt) * s) / MAX(n), 9) AS ga,
                ROUND(SUM(1.0/(1.0+exp(-(a*s+b))) - tgt) / MAX(n), 9) AS gb
              FROM tt CROSS JOIN i1 CROSS JOIN c),
            i2 AS (
              SELECT ROUND(a - ga, 9) AS a, ROUND(b - gb, 9) AS b
              FROM i1 CROSS JOIN g2)
            SELECT doc_id, ROUND(s, 6) AS score, y,
              ROUND(1.0/(1.0+exp(-(a*s+b))), 6) AS p_cal
            FROM t CROSS JOIN i2 ORDER BY doc_id"""))

  // ---- character-level Shannon entropy (repetitive-garbage axis) -----
  // Low char entropy flags "ababab…" degenerate docs the TOKEN-level
  // repetition filter can miss. Every 200th doc is overridden with a
  // planted degenerate string (entropy exactly 1.0) so the gate pins
  // both the natural spread and the low end.
  private val charEntropyQ = GraftQuery(
    "q_char_entropy",
    (s, d) => {
      val planted = documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 200 === 0, repeat(lit("ab"), 100))
          .otherwise(col("text")).as("text"))
      planted.filter(length(col("text")) >= 1)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          round(TextFunctions.charEntropy(col("text")), 6)
            .as("char_entropy"))
        .orderBy(asc("doc_id"))
    },
    Some("""WITH planted AS (
              SELECT doc_id,
                CASE WHEN doc_id % 200 = 0 THEN repeat('ab', 100)
                     ELSE text END AS text
              FROM documents),
            ch AS (
              SELECT doc_id, unnest(string_split(text, '')) AS c
              FROM planted WHERE length(text) >= 1),
            cc AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY 1, 2),
            agg AS (
              SELECT doc_id, SUM(k) AS n, SUM(k * log2(k)) AS s
              FROM cc GROUP BY 1)
            SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
              ROUND(log2(n) - s / n, 6) AS char_entropy
            FROM agg ORDER BY doc_id"""))

  // ---- fold_text feeding exact dedup (the integration the expression
  // exists for): accented/uppercased twins collapse onto their source
  // doc's dedup key. Twin construction is in-query (doc_id+1000000,
  // vowels accented + uppercased), so the oracle pins that every twin
  // group has n_copies ≥ 2 with the ORIGINAL doc as keeper.
  private val foldDedup = GraftQuery(
    "q_fold_dedup",
    (s, d) => {
      GraftFunctions.register(s)
      val base = documents(s, d).select(col("doc_id"), col("text"))
      val twins = documents(s, d).filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          translate(upper(col("text")), "AEIOU", "ÁÉÍÓÚ").as("text"))
      base.unionByName(twins)
        .select(col("doc_id"), md5(FoldText.fold_text(col("text"))).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy(asc("keeper"))
    },
    Some("""WITH twins AS (
              SELECT doc_id + 1000000 AS doc_id,
                translate(upper(text), 'AEIOU', 'ÁÉÍÓÚ') AS text
              FROM documents WHERE doc_id % 10 = 0),
            corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id, text FROM twins),
            f AS (
              SELECT doc_id,
                md5(strip_accents(nfc_normalize(lower(text)))) AS fp
              FROM corpus)
            SELECT fp, MIN(doc_id) AS keeper,
              CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM f GROUP BY fp ORDER BY keeper"""))

  // ---- streaming ingest-time curation vs batch oracle ----------------
  // The documents table streamed through quality-gate + language-ID +
  // exact-dup drop in one availableNow pass; which doc survives a dup
  // group is arrival-order-dependent, so the gate aggregates only
  // text-derived columns (identical across a group) — the oracle is
  // exact despite the nondeterministic survivor choice.
  //
  // The natural corpus language-IDs almost entirely 'en', so three
  // stopword-pure docs are planted in-query (10 identical copies each
  // at doc_id mod 50 ∈ {1,2,3}): each group survives the quality bar,
  // predicts its language, and COLLAPSES TO ONE SURVIVOR through the
  // fingerprint dedup — the multi-language buckets double as the
  // dup-drop assertion.
  private val esPlant = "el la los las de que y en un una "
  private val frPlant = "le la les de des et un une est que "
  private val dePlant = "der die das und ist ein eine nicht mit zu "

  private val streamCuration = GraftQuery(
    "q_stream_curation",
    (s, d) => {
      val stream = graft.streaming.EventsStream.readTable(s, d, "documents")
      val planted = stream.select(col("doc_id"),
        when(col("doc_id") % 50 === 1, repeat(lit(esPlant), 12))
          .when(col("doc_id") % 50 === 2, repeat(lit(frPlant), 12))
          .when(col("doc_id") % 50 === 3, repeat(lit(dePlant), 12))
          .otherwise(col("text")).as("text"))
      val curated = graft.streaming.CurationStream.curate(planted)
      graft.streaming.EventsStream.runToCompletion(s, curated,
          outputMode = "append")
        .groupBy(col("predicted"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          round(sum(col("quality")), 6).as("sum_quality"))
        .orderBy(asc("predicted"))
    },
    Some(s"""WITH planted AS (
               SELECT doc_id,
                 CASE WHEN doc_id % 50 = 1 THEN repeat('$esPlant', 12)
                      WHEN doc_id % 50 = 2 THEN repeat('$frPlant', 12)
                      WHEN doc_id % 50 = 3 THEN repeat('$dePlant', 12)
                      ELSE text END AS text
               FROM documents),
             t AS (
               SELECT doc_id, text, $toksSql AS toks FROM planted),
             m AS (
               SELECT doc_id, text, toks, len(toks) AS n,
                 len(list_filter(toks, x -> x IN
                   ('the','a','an','and','of','to','in','is','it','that')))
                   AS en_hits,
                 len(list_filter(toks, x -> x IN
                   ('el','la','los','las','de','que','y','en','un','una')))
                   AS es_hits,
                 len(list_filter(toks, x -> x IN
                   ('le','la','les','de','des','et','un','une','est','que')))
                   AS fr_hits,
                 len(list_filter(toks, x -> x IN
                   ('der','die','das','und','ist','ein','eine','nicht','mit','zu')))
                   AS de_hits,
                 length(text) AS total,
                 length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
                   AS punct
               FROM t),
             sc AS (
               SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp,
                 CAST(n AS BIGINT) AS n_tokens,
                 greatest(0.0,
                   least(1.0, CAST(n AS DOUBLE) / 100.0) * 0.5
                   + least(1.0, (CASE WHEN n = 0 THEN 0.0
                       ELSE CAST(en_hits AS DOUBLE) / CAST(n AS DOUBLE) END)
                       * 5.0) * 0.5
                   - (CASE WHEN total = 0 THEN 0.0
                       ELSE CAST(punct AS DOUBLE) / CAST(total AS DOUBLE) END))
                   AS quality,
                 CASE
                   WHEN de_hits > 0 AND de_hits >= en_hits
                     AND de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
                   WHEN en_hits > 0 AND en_hits >= es_hits
                     AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
                   WHEN es_hits > 0 AND es_hits >= fr_hits
                     AND es_hits >= de_hits AND es_hits >= en_hits THEN 'es'
                   WHEN fr_hits > 0 AND fr_hits >= es_hits
                     AND fr_hits >= de_hits AND fr_hits >= en_hits THEN 'fr'
                   ELSE 'und'
                 END AS predicted
               FROM m),
             q AS (SELECT * FROM sc WHERE quality >= 0.35),
             sv AS (
               SELECT fp, MIN(predicted) AS predicted,
                 MIN(n_tokens) AS n_tokens, MIN(quality) AS quality
               FROM q GROUP BY fp)
             SELECT predicted, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
               ROUND(SUM(quality), 6) AS sum_quality
             FROM sv GROUP BY predicted ORDER BY predicted"""))

  // ---- full curation stack, end-to-end (round-10 composition gate) ---
  // The whole LLM-data pipeline as ONE lazy plan: quality filter →
  // line dedup → exact dedup → minhash near-dup → DSIR select → pack.
  // Per-doc oracle: the packing offsets are over the corpus that
  // SURVIVES every stage, so drift anywhere upstream moves every
  // downstream row. Plant structure (all replayed by the oracle):
  //  - multi-line build (header/chunk-lines/footer — the q_line_dedup
  //    construction) so line dedup does real work;
  //  - an exact clone of every 5th doc (same built text) that the
  //    exact-dedup stage must drop;
  //  - a whitespace-variant clone of every 10th doc (chunk tokens
  //    joined with DOUBLE spaces: different clean_text string, same
  //    token stream) that survives exact dedup and is dropped by the
  //    minhash stage — restricted, as in q_dedup_minhash, to the
  //    SQL-decidable subset of pairs with equal token-stream
  //    fingerprints (identical streams ⇒ identical signatures ⇒
  //    candidacy guaranteed; the 0.9 ≤ j < 1 tail stays pinned by unit
  //    tests and the standalone minhash gates).
  private val llmPipeline = GraftQuery(
    "q_llm_data_pipeline",
    (s, d) => {
      val base = qualityDocs(s, d)
      val nChunks = ceil(size(col("toks")).cast("double") / 10.0).cast("int")
      def builtWith(sep: String) = array_join(concat(
        array(lit("shared boilerplate header")),
        transform(sequence(lit(0), nChunks - 1),
          g => concat_ws(sep, slice(col("toks"), g * 10 + 1, lit(10)))),
        array(concat(lit("footer for "), col("source")))), "\n")
      val orig = base.select(col("doc_id"), col("source"),
        builtWith(" ").as("text"))
      val corpus = orig
        .unionByName(base.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
            builtWith(" ").as("text")))
        .unionByName(base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("source"),
            builtWith("  ").as("text")))
      // Lineage cut (the q_dedup_minhash_10x idiom): the cleaned corpus
      // feeds SIX downstream consumers (exact-dedup keepers + semi-join,
      // minhash signatures, stream fingerprints, both DSIR sides, the
      // packing prefix). Left lazy, every consumer re-derives the
      // build→explode-lines→reassemble chain AND re-compiles its codegen
      // — measured 236 s at sf0.1 vs ~15 s with the checkpoint. The
      // stage boundary is exactly where a production pipeline would
      // materialize the post-cleaning corpus anyway.
      val cleaned = LineDedup
        .dropCommonLines(corpus, "doc_id", "text", minDocFreq = 5L)
        .join(corpus.select("doc_id", "source"), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("clean_text"),
          TextFunctions.tokens(col("clean_text")).as("ctoks"))
        .transform(graft.plans.Lineage.cut(_))
        // above the cut (r18 sweep): pushed inside, this re-tokenized
        // clean_text in an interpreted pre-checkpoint Filter
        .filter(size(col("ctoks")) >= 1)
      val afterExact = graft.operators.Dedup.dropDuplicatesByKey(
        cleaned, md5(col("clean_text")), "doc_id")
      // tokens entry (r19): ctoks IS tokens(clean_text), materialized
      // in the cut above — the textCol entry re-ran the tokenizer over
      // the whole cleaned corpus inside the minhash stage
      val pairs = graft.operators.Dedup.nearDuplicatePairsTokens(afterExact,
        minJaccard = 0.9, idCol = "doc_id", toksCol = "ctoks")
      val fps = afterExact.select(col("doc_id"),
        TextFunctions.exactFingerprintTokens(col("ctoks")).as("fp"))
      val dropIds = pairs
        .join(fps.select(col("doc_id").as("a"), col("fp").as("fa")), "a")
        .join(fps.select(col("doc_id").as("b"), col("fp").as("fb")), "b")
        .filter(col("fa") === col("fb"))
        .select(col("b").as("doc_id")).distinct()
      // Both boundaries use the bytes-targeted self-sizing cut: the
      // post-checkpoint width must track data volume, not the shuffle
      // config (the measured 1.66× shuffle=128 tax — see plans.Lineage)
      val afterNear = graft.plans.Lineage.cut(
        afterExact.join(dropIds, Seq("doc_id"), "left_anti"))
      val weights = graft.operators.Dsir.importanceWeights(
        raw = afterNear.select(col("doc_id"), col("ctoks").as("toks")),
        target = afterNear.filter(col("source").isin("src0", "src1"))
          .select(col("doc_id"), col("ctoks").as("toks")),
        idCol = "doc_id", toksCol = "toks", numBuckets = 1024)
      val selected = graft.operators.Dsir
        .resampleTopK(weights, "doc_id", "log_weight", k = 200)
        .select("doc_id")
      // Cut the packing input (r19): packFixedLength's
      // repartitionByRange needs range bounds, and RangePartitioner's
      // sampling sketch is a FULL pass over its child — without the
      // boundary the child is the semi-join + the whole DSIR weights
      // tower, recomputed once for the sampling pass and once for the
      // real one. The cut is ~k rows (the DSIR top-k survivors), so the
      // boundary costs nothing and the DSIR tower runs once.
      graft.operators.Packing.packFixedLength(
          graft.plans.Lineage.cut(
            afterNear.join(selected, Seq("doc_id"), "left_semi")
              .select(col("doc_id"), col("clean_text").as("text"))),
          seqLen = 256L)
        .select(col("doc_id"), col("n_tokens"), col("g_start"),
          col("first_seq"), col("last_seq"),
          (col("last_seq") - col("first_seq") + 1).as("n_seqs"))
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH q AS (
               SELECT doc_id, source, text, $toksSql AS toks,
                 $qualitySql AS quality
               FROM documents WHERE len($toksSql) >= 1),
             kept AS (
               SELECT doc_id, source, toks FROM q WHERE quality >= 0.3),
             built AS (
               SELECT doc_id, source,
                 'shared boilerplate header' || chr(10) ||
                 array_to_string(list_transform(
                   generate_series(0,
                     CAST(ceil(len(toks) / 10.0) AS INT) - 1),
                   g -> array_to_string(
                     list_slice(toks, g * 10 + 1, g * 10 + 10), ' ')),
                   chr(10)) ||
                 chr(10) || 'footer for ' || source AS text1,
                 'shared boilerplate header' || chr(10) ||
                 array_to_string(list_transform(
                   generate_series(0,
                     CAST(ceil(len(toks) / 10.0) AS INT) - 1),
                   g -> array_to_string(
                     list_slice(toks, g * 10 + 1, g * 10 + 10), '  ')),
                   chr(10)) ||
                 chr(10) || 'footer for ' || source AS text2
               FROM kept),
             corpus AS (
               SELECT doc_id, source, text1 AS text FROM built
               UNION ALL
               SELECT doc_id + 1000000, source, text1 FROM built
               WHERE doc_id % 5 = 0
               UNION ALL
               SELECT doc_id + 2000000, source, text2 FROM built
               WHERE doc_id % 10 = 0),
             sp AS (
               SELECT doc_id, source, string_split(text, chr(10)) AS ls
               FROM corpus),
             lines AS (
               SELECT doc_id, source, i AS pos, ls[i] AS line
               FROM sp, unnest(generate_series(1, len(ls))) AS u(i)),
             freq AS (
               SELECT line, COUNT(DISTINCT doc_id) AS line_df
               FROM lines GROUP BY 1),
             clean AS (
               SELECT l.doc_id, ANY_VALUE(l.source) AS source,
                 COALESCE(string_agg(l.line, chr(10) ORDER BY l.pos)
                   FILTER (WHERE f.line_df < 5), '') AS clean_text
               FROM lines l JOIN freq f ON l.line = f.line
               GROUP BY l.doc_id),
             ct AS (
               SELECT doc_id, source, clean_text,
                 list_filter(string_split_regex(trim(clean_text), '\\s+'),
                   x -> x <> '') AS ctoks
               FROM clean
               WHERE len(list_filter(
                 string_split_regex(trim(clean_text), '\\s+'),
                 x -> x <> '')) >= 1),
             keepers AS (
               SELECT md5(clean_text) AS k, MIN(doc_id) AS keeper
               FROM ct GROUP BY 1),
             ex AS (
               SELECT ct.* FROM ct JOIN keepers
               ON md5(ct.clean_text) = keepers.k
                 AND ct.doc_id = keepers.keeper),
             tw AS (
               SELECT md5(array_to_string(ctoks, ' ')) AS fp,
                 MIN(doc_id) AS keeper
               FROM ex WHERE len(ctoks) >= 5 GROUP BY 1),
             dr AS (
               SELECT e.doc_id FROM ex e JOIN tw
               ON md5(array_to_string(e.ctoks, ' ')) = tw.fp
                 AND e.doc_id > tw.keeper
               WHERE len(e.ctoks) >= 5),
             nd AS (
               SELECT ex.* FROM ex LEFT JOIN dr
               ON ex.doc_id = dr.doc_id
               WHERE dr.doc_id IS NULL),
             feats AS (
               SELECT doc_id, unnest(ctoks) AS ng FROM nd
               UNION ALL
               SELECT doc_id, ctoks[i] || ' ' || ctoks[i + 1]
               FROM nd, unnest(generate_series(1, len(ctoks) - 1)) AS u(i)
               WHERE len(ctoks) >= 2),
             fb AS (
               SELECT f.doc_id, n.source,
                 ('0x' || substr(md5(f.ng), 1, 8))::BIGINT % 1024 AS bucket
               FROM feats f JOIN nd n USING (doc_id)),
             tgt AS (
               SELECT bucket FROM fb WHERE source IN ('src0', 'src1')),
             ct2 AS (SELECT bucket, COUNT(*) AS c_t FROM tgt GROUP BY 1),
             cr AS (SELECT bucket, COUNT(*) AS c_r FROM fb GROUP BY 1),
             nt AS (SELECT COUNT(*) AS n_t FROM tgt),
             nr AS (SELECT COUNT(*) AS n_r FROM fb),
             llr AS (
               SELECT cr.bucket,
                 ln((COALESCE(ct2.c_t, 0) + 1.0) / (nt.n_t + 1024.0))
                   - ln((cr.c_r + 1.0) / (nr.n_r + 1024.0)) AS llr
               FROM cr LEFT JOIN ct2 USING (bucket)
               CROSS JOIN nt CROSS JOIN nr),
             w AS (
               SELECT f.doc_id, ROUND(SUM(l.llr), 6) AS log_weight
               FROM fb f JOIN llr l USING (bucket) GROUP BY 1),
             sel AS (
               SELECT doc_id,
                 ROUND(log_weight + -ln(-ln(
                   (('0x' || substr(md5(doc_id::VARCHAR || ':dsir'), 1, 8))
                      ::BIGINT + 0.5) / 4294967296.0)), 6) AS score
               FROM w ORDER BY score DESC, doc_id LIMIT 200),
             p0 AS (
               SELECT nd.doc_id, len(nd.ctoks) AS n_tokens
               FROM nd JOIN sel USING (doc_id) WHERE len(nd.ctoks) >= 1),
             p1 AS (
               SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS g_start
               FROM p0)
             SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(g_start AS BIGINT) AS g_start,
               CAST(g_start // 256 AS BIGINT) AS first_seq,
               CAST((g_start + n_tokens - 1) // 256 AS BIGINT) AS last_seq,
               CAST((g_start + n_tokens - 1) // 256 - g_start // 256 + 1
                 AS BIGINT) AS n_seqs
             FROM p1 ORDER BY doc_id"""),
    headline = true)

  // ---- span/winnow pipeline variant (composition breadth) ------------
  // The q_llm_data_pipeline composition pattern extended to the
  // SUBSTRING-granularity curation stages: quality filter → exact dedup
  // → span EXCISION (Lee et al.) → winnowing fingerprints → fixed-length
  // packing, one lazy plan over the surviving corpus. Every stage is
  // individually gated (q_curation_pipeline, q_dedup_exact,
  // q_span_removal, q_winnow_fingerprint, q_pack_sequences); this gate
  // pins that they COMPOSE — the winnow digests are over the excised
  // text and the packing offsets over the excised token counts, so
  // drift in ANY stage moves every downstream row. Plants (both
  // oracle-replayed):
  //  - an exact clone of every 5th surviving doc (+1000000) that the
  //    exact-dedup stage must drop BEFORE excision (the "no dedup
  //    scheme should see exact clones" discipline — clones would make
  //    every gram df ≥ 2 and excise whole documents);
  //  - the 12-token passage on every 10th doc: excision cuts exactly
  //    those 12 positions everywhere but the globally-first planted
  //    doc, shifting that doc's winnow digest AND every later doc's
  //    packing offset by 12 tokens per planted doc.
  private val llmPipelineSpans = GraftQuery(
    "q_llm_pipeline_spans",
    (s, d) => {
      val base = qualityDocs(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 0,
            concat(col("text"), lit(" " + plantedPassage)))
            .otherwise(col("text")).as("text"))
      val corpus = base.unionByName(
        base.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val deduped = graft.operators.Dedup.dropDuplicatesByKey(
        corpus, md5(col("text")), "doc_id")
      // stage boundary (the q_llm_data_pipeline lineage-cut idiom):
      // three consumers below — winnow, packing, final projection
      val excised = SpanDedup.removeDupSpans(
          deduped.withColumn("toks", TextFunctions.tokens(col("text"))),
          "doc_id", "toks", k = 8)
        .withColumn("ctoks", TextFunctions.tokens(col("clean_text")))
        .transform(graft.plans.Lineage.cut(_))
        // above the cut (r18 sweep): pushed inside, this re-tokenized
        // clean_text in an interpreted pre-checkpoint Filter
        .filter(size(col("ctoks")) >= 1)
      val wfp = graft.operators.Winnow.fingerprints(
          excised, "doc_id", "ctoks", k = 5, w = 4)
        .select(col("doc_id"), col("n_fps"), col("fp_digest"))
      val packed = graft.operators.Packing.packFixedLength(
        excised.select(col("doc_id"), col("clean_text").as("text")),
        seqLen = 128L)
      excised.select(col("doc_id"), col("n_tokens"), col("n_removed"))
        .join(wfp, Seq("doc_id"), "left")
        .join(packed.select(col("doc_id"), col("g_start"),
          col("first_seq"), col("last_seq")), Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          coalesce(col("n_fps"), lit(0L)).as("n_fps"),
          coalesce(col("fp_digest"), md5(lit(""))).as("fp_digest"),
          col("g_start"), col("first_seq"), col("last_seq"))
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH q AS (
               SELECT doc_id, text, $qualitySql AS quality FROM documents
               WHERE len($toksSql) >= 1),
             pl AS (
               SELECT doc_id,
                 CASE WHEN doc_id % 10 = 0
                      THEN text || ' $plantedPassage'
                      ELSE text END AS text
               FROM q WHERE quality >= 0.3),
             corpus AS (
               SELECT doc_id, text FROM pl
               UNION ALL
               SELECT doc_id + 1000000, text FROM pl WHERE doc_id % 5 = 0),
             keepers AS (
               SELECT md5(text) AS kk, MIN(doc_id) AS keeper
               FROM corpus GROUP BY 1),
             ded AS (
               SELECT c.doc_id, $toksSql AS toks
               FROM corpus c JOIN keepers
               ON md5(c.text) = keepers.kk AND c.doc_id = keepers.keeper),
             grams AS (
               SELECT doc_id, i AS pos,
                 md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS gk
               FROM ded, unnest(generate_series(1, len(toks) - 7)) AS u(i)
               WHERE len(toks) >= 8),
             dup AS (
               SELECT gk, MIN(doc_id) AS keeper FROM grams GROUP BY gk
               HAVING COUNT(DISTINCT doc_id) >= 2),
             rm AS (
               SELECT DISTINCT g.doc_id, ci
               FROM grams g JOIN dup USING (gk),
                 unnest(generate_series(g.pos, g.pos + 7)) AS c(ci)
               WHERE g.doc_id <> dup.keeper),
             rmn AS (
               SELECT doc_id, COUNT(*) AS n_removed FROM rm GROUP BY 1),
             tk AS (
               SELECT doc_id, i AS ci, toks[i] AS tok
               FROM ded, unnest(generate_series(1, len(toks))) AS u(i)),
             clean AS (
               SELECT tk.doc_id,
                 COALESCE(string_agg(tk.tok, ' ' ORDER BY tk.ci)
                   FILTER (WHERE r.ci IS NULL), '') AS clean_text
               FROM tk LEFT JOIN rm r
                 ON tk.doc_id = r.doc_id AND tk.ci = r.ci
               GROUP BY 1),
             ex AS (
               SELECT d.doc_id, len(d.toks) AS n_tokens,
                 COALESCE(rmn.n_removed, 0) AS n_removed,
                 list_filter(string_split_regex(trim(c.clean_text), '\\s+'),
                   x -> x <> '') AS ctoks
               FROM ded d LEFT JOIN rmn USING (doc_id)
                 LEFT JOIN clean c USING (doc_id)
               WHERE len(list_filter(
                 string_split_regex(trim(c.clean_text), '\\s+'),
                 x -> x <> '')) >= 1),
             g2 AS (
               SELECT doc_id,
                 list_transform(generate_series(1, len(ctoks) - 4),
                   i -> ('0x' || substr(md5(array_to_string(
                     list_slice(ctoks, i, i + 4), ' ')), 1, 8))::BIGINT)
                   AS gh
               FROM ex WHERE len(ctoks) >= 5),
             wf AS (
               SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, greatest(1, len(gh) - 3)),
                   p -> list_aggregate(list_slice(gh, p, p + 3), 'min')))
                   AS fps
               FROM g2),
             wfo AS (
               SELECT doc_id, len(fps) AS n_fps,
                 md5(array_to_string(list_sort(fps), ' ')) AS fp_digest
               FROM wf),
             p1 AS (
               SELECT doc_id, len(ctoks) AS pn,
                 COALESCE(SUM(len(ctoks)) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS g_start
               FROM ex)
             SELECT e.doc_id, CAST(e.n_tokens AS BIGINT) AS n_tokens,
               CAST(e.n_removed AS BIGINT) AS n_removed,
               CAST(COALESCE(w.n_fps, 0) AS BIGINT) AS n_fps,
               COALESCE(w.fp_digest, md5('')) AS fp_digest,
               CAST(p.g_start AS BIGINT) AS g_start,
               CAST(p.g_start // 128 AS BIGINT) AS first_seq,
               CAST((p.g_start + p.pn - 1) // 128 AS BIGINT) AS last_seq
             FROM ex e LEFT JOIN wfo w USING (doc_id)
               JOIN p1 p USING (doc_id)
             ORDER BY e.doc_id"""))

  override val queries: Seq[GraftQuery] =
    Seq(lineDedup, lmScore, lmKn, lmTrigramKn, spanCoverage, spanRemoval,
        tokenChunks,
        winnowFp, winnowPairs, pretrainPipeline, textFold, nbClassify,
        linearClassify, classifyStored, plattCalibrate,
        charEntropyQ, foldDedup, streamCuration, llmPipeline,
        llmPipelineSpans)
}
