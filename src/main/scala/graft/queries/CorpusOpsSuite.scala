package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions

/** Corpus curation operators a large-scale training-data pipeline needs
  * beyond per-doc scoring: repetition signals, benchmark
  * decontamination, mixture reweighting, n-gram frequency tables, and a
  * composite Gopher-style rule filter. All DuckDB-oracled.
  *
  * Scale notes (100 TB): every query here is a scan → per-row array
  * program → (at most) one hash aggregation on a well-distributed key
  * (doc_id, n-gram, source); no windows over unbounded partitions. The
  * decontamination join deliberately aggregates the *benchmark* side to
  * a distinct n-gram set first — that side is small (eval suites are
  * MBs, not TBs) and broadcastable, so the corpus never shuffles.
  */
object CorpusOpsSuite extends QuerySuite {

  private val toksSql =
    """list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"""

  /** Word n-grams as a BOUND array column (the interpreted-HOF pitfall:
    * `element_at` on an inline nested expression re-evaluates it per
    * element — project `toks` first).
    */
  private def ngrams(toks: org.apache.spark.sql.Column, n: Int) =
    transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))

  private def ngramsSql(n: Int) = {
    val parts = (0 until n).map(o => s"toks[i + $o]").mkString(" || ' ' || ")
    s"list_transform(generate_series(1, len(toks) - ${n - 1}), i -> $parts)"
  }

  // ---- per-document repetition signal (Gopher-style) -----------------
  // Fraction of duplicated bigrams: templated/boilerplate docs repeat
  // phrase structure and score high; prose scores near 0.
  private val repetition = GraftQuery(
    "q_repetition",
    (s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), ngrams(col("toks"), 2).as("bg"))
      t.select(
          col("doc_id"),
          size(col("bg")).as("n_bigrams"),
          size(array_distinct(col("bg"))).as("n_distinct"))
        .select(
          col("doc_id"), col("n_bigrams"), col("n_distinct"),
          round(lit(1.0) - col("n_distinct").cast("double") /
            col("n_bigrams").cast("double"), 6).as("dup_ratio"))
        .withColumn("repetitive",
          when(col("dup_ratio") > 0.2, lit(1)).otherwise(lit(0)))
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, $toksSql AS toks FROM documents
               WHERE len($toksSql) >= 2),
             bg AS (
               SELECT doc_id, ${ngramsSql(2)} AS bg FROM t),
             m AS (
               SELECT doc_id, len(bg) AS n_bigrams,
                      len(list_distinct(bg)) AS n_distinct
               FROM bg)
             SELECT doc_id, n_bigrams, n_distinct,
               ROUND(1.0 - CAST(n_distinct AS DOUBLE) /
                 CAST(n_bigrams AS DOUBLE), 6) AS dup_ratio,
               CASE WHEN 1.0 - CAST(n_distinct AS DOUBLE) /
                 CAST(n_bigrams AS DOUBLE) > 0.2 THEN 1 ELSE 0
               END AS repetitive
             FROM m ORDER BY doc_id"""))

  // ---- full Gopher repetition-signal set (Rae et al. 2021 Table A1) --
  // The complete within-document repetition gate q_repetition's
  // dup-bigram ratio sketches: duplicate-line fraction + character
  // fraction, most-frequent-{2,3,4}-gram character fraction, and
  // overlap-aware duplicated-5-gram character coverage, with the
  // published thresholds as a first-failing-rule verdict. The corpus
  // has no within-doc line structure, so the gate builds it in-query
  // (the q_line_dedup construction) and PLANTS the repetition the
  // signals exist to catch: every 3rd doc repeats its first line
  // (dup-line + long-gram signals fire), every 7th doc re-emits its
  // first 5 tokens as an extra line (duplicated 5-gram fires). All
  // signals are per-row HOF programs — no shuffle; the oracle replays
  // line build, plants, tie-breaks, and coverage arithmetic exactly.
  private val repetitionSignals = GraftQuery(
    "q_repetition_signals",
    (s, d) => {
      import graft.functions.RepetitionSignals
      // the ONLY shuffle in this gate, and it exists purely because the
      // testdata table is one small parquet file = one input split: the
      // signal computation is a pure per-doc map, and at real scale
      // file splits parallelize it for free. Without this, the whole
      // heavy map runs as a single task on local[32] (measured 4.7 s
      // vs ~0.9 s spread across cores).
      val t = documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 5)
      val nChunks = ceil(size(col("toks")).cast("double") / 10.0).cast("int")
      val chunks = transform(sequence(lit(0), nChunks - 1),
        g => concat_ws(" ", slice(col("toks"), g * 10 + 1, lit(10))))
      val built = t.select(col("doc_id"), col("toks"), chunks.as("chunks"))
        .select(col("doc_id"),
          concat(col("chunks"),
            when(col("doc_id") % 3 === 0, slice(col("chunks"), 1, 1))
              .otherwise(slice(col("chunks"), 1, 0)),
            when(col("doc_id") % 7 === 0,
                array(concat_ws(" ", slice(col("toks"), 1, 5))))
              .otherwise(slice(col("chunks"), 1, 0))).as("lines"))
        .withColumn("toks2",
          flatten(transform(col("lines"), l => split(l, " "))))
      RepetitionSignals.withSignals(built, "lines", "toks2")
        .select(col("doc_id"),
          size(col("lines")).as("n_lines"),
          round(col("rep_dup_line_frac"), 6).as("dup_line_frac"),
          round(col("rep_dup_line_char_frac"), 6).as("dup_line_char_frac"),
          round(col("rep_top2_frac"), 6).as("top2_frac"),
          round(col("rep_top3_frac"), 6).as("top3_frac"),
          round(col("rep_top4_frac"), 6).as("top4_frac"),
          round(col("rep_dup5_frac"), 6).as("dup5_frac"),
          round(col("rep_dup10_frac"), 6).as("dup10_frac"))
        .withColumn("verdict", RepetitionSignals
          .repetitionVerdict(col("dup_line_frac"), col("dup_line_char_frac"),
            col("top2_frac"), col("top3_frac"), col("top4_frac"),
            col("dup5_frac"), col("dup10_frac")))
        .orderBy(asc("doc_id"))
    },
    Some(repetitionSignalsSql),
    // headline: the session's heaviest pure per-doc map (full
    // six-signal set); TimeQ band 1.3–5 s from a 1.77 s warm floor
    // after the split-simulation repartition (single-task floor was
    // 4.70 s — BASELINE round 10, third session)
    headline = true)

  /** DuckDB n-gram array over a list column (shared by the repetition
    * oracles).
    */
  private def gramsSql(src: String, n: Int) = {
    val parts = (0 until n).map(o => s"$src[i + $o]").mkString(" || ' ' || ")
    s"list_transform(generate_series(1, len($src) - ${n - 1}), i -> $parts)"
  }

  /** Most-frequent-n-gram winner struct (count desc, char mass desc,
    * gram asc — the engine's struct-sort tie-break).
    */
  private def bestSql(n: Int) =
    s"""list_sort(list_transform(list_distinct(g$n),
          g -> {'neg_cnt': -len(list_filter(g$n, x -> x = g)),
                'neg_chars': -(length(g) - ${n - 1}),
                'gram': g}))[1] AS b$n"""

  private def topSql(n: Int) =
    s"""CASE WHEN len(toks2) < $n OR total_chars = 0 THEN 0.0
          ELSE (-b$n.neg_cnt * -b$n.neg_chars)::DOUBLE / total_chars
        END"""

  private lazy val repetitionSignalsSql: String = {
    s"""WITH t AS (
          SELECT doc_id, $toksSql AS toks FROM documents
          WHERE len($toksSql) >= 5),
        b AS (
          SELECT doc_id, toks,
            list_transform(
              generate_series(0, CAST(ceil(len(toks) / 10.0) AS INT) - 1),
              g -> array_to_string(
                     list_slice(toks, g * 10 + 1, g * 10 + 10), ' '))
              AS chunks
          FROM t),
        l AS (
          SELECT doc_id,
            chunks ||
              (CASE WHEN doc_id % 3 = 0 THEN [chunks[1]]
                    ELSE [] END) ||
              (CASE WHEN doc_id % 7 = 0
                    THEN [array_to_string(list_slice(toks, 1, 5), ' ')]
                    ELSE [] END) AS lines
          FROM b),
        tk AS (
          SELECT doc_id, lines,
            flatten(list_transform(lines, x -> string_split(x, ' ')))
              AS toks2
          FROM l),
        g AS (
          SELECT doc_id, lines, toks2,
            length(list_aggregate(toks2, 'string_agg', '')) AS total_chars,
            ${gramsSql("toks2", 2)} AS g2,
            ${gramsSql("toks2", 3)} AS g3,
            ${gramsSql("toks2", 4)} AS g4,
            ${gramsSql("toks2", 5)} AS g5,
            ${gramsSql("toks2", 10)} AS g10
          FROM tk),
        s AS (
          SELECT doc_id, lines, toks2, total_chars, g5, g10,
            ${bestSql(2)}, ${bestSql(3)}, ${bestSql(4)}
          FROM g),
        m AS (
          SELECT doc_id,
            CAST(len(lines) AS INT) AS n_lines,
            ROUND(CASE WHEN len(lines) = 0 THEN 0.0
              ELSE 1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
              END, 6) AS dup_line_frac,
            ROUND(CASE WHEN COALESCE(list_sum(list_transform(lines,
                x -> length(x))), 0) = 0 THEN 0.0
              ELSE COALESCE(list_sum(list_transform(
                  list_filter(lines,
                    x -> len(list_filter(lines, y -> y = x)) >= 2),
                  x -> length(x))), 0)::DOUBLE /
                list_sum(list_transform(lines, x -> length(x)))
              END, 6) AS dup_line_char_frac,
            ROUND(${topSql(2)}, 6) AS top2_frac,
            ROUND(${topSql(3)}, 6) AS top3_frac,
            ROUND(${topSql(4)}, 6) AS top4_frac,
            ROUND(CASE WHEN len(toks2) < 5 OR total_chars = 0 THEN 0.0 ELSE
              COALESCE(list_sum(list_transform(
                list_distinct(flatten(list_transform(
                  list_filter(generate_series(1, len(toks2) - 4),
                    p -> len(list_filter(g5, x -> x = g5[p])) >= 2),
                  p -> generate_series(p, p + 4)))),
                i -> length(toks2[i]))), 0)::DOUBLE / total_chars
              END, 6) AS dup5_frac,
            ROUND(CASE WHEN len(toks2) < 10 OR total_chars = 0 THEN 0.0 ELSE
              COALESCE(list_sum(list_transform(
                list_distinct(flatten(list_transform(
                  list_filter(generate_series(1, len(toks2) - 9),
                    p -> len(list_filter(g10, x -> x = g10[p])) >= 2),
                  p -> generate_series(p, p + 9)))),
                i -> length(toks2[i]))), 0)::DOUBLE / total_chars
              END, 6) AS dup10_frac
          FROM s)
        SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac,
          top2_frac, top3_frac, top4_frac, dup5_frac, dup10_frac,
          CASE WHEN dup_line_frac > 0.30 THEN 'dup_lines'
               WHEN dup_line_char_frac > 0.20 THEN 'dup_line_chars'
               WHEN top2_frac > 0.20 THEN 'top_2gram'
               WHEN top3_frac > 0.18 THEN 'top_3gram'
               WHEN top4_frac > 0.16 THEN 'top_4gram'
               WHEN dup5_frac > 0.15 THEN 'dup_5gram'
               WHEN dup10_frac > 0.10 THEN 'dup_10gram'
               ELSE 'keep' END AS verdict
        FROM m ORDER BY doc_id"""
  }

  // ---- URL-based curation: host, blocklist, per-domain cap -----------
  // The C4/RefinedWeb front-of-pipeline stage: extract the host with
  // Spark's parse_url, derive the registered domain, drop blocklisted
  // hosts, and cap documents per host (unbounded single-domain mass is
  // both a quality and a dedup-skew hazard). Documents carry no URL, so
  // the gate synthesizes one deterministically from a 7-domain pool —
  // the ORACLE recomputes the host directly from the pool arithmetic,
  // so the gate cross-checks that parse_url's extraction agrees with
  // the ground truth construction. Per-host cap is a row_number window
  // ordered by doc_id: at scale this is the WindowGroupLimit top-k
  // shape (per-partition cap before the sort), one shuffle on host.
  private val urlDomainPool = Seq(
    "alpha.example.com", "beta.example.org", "spam.example.net",
    "gamma.example.io", "delta.example.co", "ads.example.biz",
    "zeta.example.dev")
  private val urlBlocklist = Seq("spam.example.net", "ads.example.biz")

  private val urlCuration = GraftQuery(
    "q_url_curation",
    (s, d) => {
      val pool = array(urlDomainPool.map(lit): _*)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("host").orderBy(asc("doc_id"))
      documents(s, d)
        .withColumn("url", concat(lit("https://"),
          element_at(pool, (col("doc_id") % 7 + 1).cast("int")),
          lit("/p/"), col("doc_id"), lit("?ref=x")))
        .withColumn("host", parse_url(col("url"), lit("HOST")))
        .withColumn("reg_domain",
          regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
        .filter(!col("host").isin(urlBlocklist: _*))
        .withColumn("host_rank", row_number().over(w))
        .filter(col("host_rank") <= 30)
        .select(col("doc_id"), col("url"), col("host"), col("reg_domain"),
          col("host_rank").cast("long").as("host_rank"))
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH u AS (
               SELECT doc_id,
                 ${urlDomainPool.map(h => s"'$h'")
                   .mkString("[", ", ", "]")}[(doc_id % 7) + 1] AS host
               FROM documents),
             f AS (
               SELECT doc_id, host,
                 'https://' || host || '/p/' || doc_id || '?ref=x' AS url,
                 regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS reg_domain,
                 ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id)
                   AS host_rank
               FROM u
               WHERE host NOT IN (${urlBlocklist.map(h => s"'$h'")
                 .mkString(", ")}))
             SELECT doc_id, url, host, reg_domain,
               CAST(host_rank AS BIGINT) AS host_rank
             FROM f WHERE host_rank <= 30 ORDER BY doc_id"""))

  // ---- unicode script detection (writing-system ID) ------------------
  // The pre-language-ID routing stage of a multilingual pipeline:
  // stopword language-ID (q_lang_id) only works within an alphabet —
  // script detection routes docs to the right alphabet first (and
  // catches mixed-script spam/homoglyph attacks outright). Per-doc
  // character counts per Unicode script class (Latin / Cyrillic /
  // Greek / Han) plus the dominant script with a fixed tie order.
  // Engine uses Java regex script classes (\p{IsCyrillic}), the oracle
  // RE2's (\p{Cyrillic}) — agreeing counts ARE the cross-engine check.
  // The corpus is pure ASCII, so script runs are planted per doc_id
  // mod 4; everything is regexp arithmetic in the scan (no shuffle).
  private val scriptDetect = GraftQuery(
    "q_script_detect",
    (s, d) => {
      val planted = when(col("doc_id") % 4 === 1, lit(" привет мир"))
        .when(col("doc_id") % 4 === 2, lit(" γεια σου κόσμε"))
        .when(col("doc_id") % 4 === 3, lit(" 你好世界"))
        .otherwise(lit(""))
      def cnt(cls: String) = (length(col("t2")) -
        length(regexp_replace(col("t2"), s"[\\p{Is$cls}]", ""))).cast("long")
      documents(s, d)
        .withColumn("t2", concat(col("text"), planted))
        .select(col("doc_id"),
          cnt("Latin").as("n_latin"),
          cnt("Cyrillic").as("n_cyrillic"),
          cnt("Greek").as("n_greek"),
          cnt("Han").as("n_han"))
        .withColumn("dominant",
          when(col("n_latin") >= greatest(col("n_cyrillic"), col("n_greek"),
            col("n_han")), lit("latin"))
          .when(col("n_cyrillic") >= greatest(col("n_greek"), col("n_han")),
            lit("cyrillic"))
          .when(col("n_greek") >= col("n_han"), lit("greek"))
          .otherwise(lit("han")))
        .orderBy(asc("doc_id"))
    },
    Some("""WITH t AS (
              SELECT doc_id,
                text || CASE
                  WHEN doc_id % 4 = 1 THEN ' привет мир'
                  WHEN doc_id % 4 = 2 THEN ' γεια σου κόσμε'
                  WHEN doc_id % 4 = 3 THEN ' 你好世界'
                  ELSE '' END AS t2
              FROM documents),
            m AS (
              SELECT doc_id,
                length(t2) - length(regexp_replace(t2, '[\p{Latin}]', '',
                  'g')) AS n_latin,
                length(t2) - length(regexp_replace(t2, '[\p{Cyrillic}]', '',
                  'g')) AS n_cyrillic,
                length(t2) - length(regexp_replace(t2, '[\p{Greek}]', '',
                  'g')) AS n_greek,
                length(t2) - length(regexp_replace(t2, '[\p{Han}]', '',
                  'g')) AS n_han
              FROM t)
            SELECT doc_id, n_latin, n_cyrillic, n_greek, n_han,
              CASE
                WHEN n_latin >= greatest(n_cyrillic, n_greek, n_han)
                  THEN 'latin'
                WHEN n_cyrillic >= greatest(n_greek, n_han) THEN 'cyrillic'
                WHEN n_greek >= n_han THEN 'greek'
                ELSE 'han' END AS dominant
            FROM m ORDER BY doc_id"""))

  // ---- web-corpus pipeline COMPOSITION (third-session operators) -----
  // The q_llm_data_pipeline convention applied to the front-of-pipeline
  // web stages added this session, as ONE lazy plan: per-host document
  // cap (keep the NEWEST 40 per host — ROW_NUMBER DESC, the
  // WindowGroupLimit shape) → script routing (drop any doc with
  // Cyrillic/Greek/Han contamination) → repetition filter (Gopher
  // dup-line + top-2-gram signals on the line build, RAW values in the
  // predicate — both engines run identical IEEE arithmetic) → word-
  // count bounds → exact dedup (min-id keeper) → token-budget packing.
  // Plants: an exact clone of every 5th doc at id+1e6 ("newest", so
  // the DESC cap favors it — the dedup stage sees real work whenever
  // its original also survives), and the script/repetition plants ride
  // the id arithmetic through the shifted clone ids. Every stage is
  // individually gated elsewhere; this gate pins that the NEW stages
  // compose — any upstream drift moves every downstream pack offset.
  private val webPipeline = GraftQuery(
    "q_web_pipeline",
    (s, d) => {
      import graft.functions.RepetitionSignals
      val pool = array(urlDomainPool.map(lit): _*)
      val base = documents(s, d).select(col("doc_id"), col("text"))
      val corpus = base.unionByName(
        base.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("host").orderBy(desc("doc_id"))
      val s1 = corpus
        .withColumn("host",
          element_at(pool, (col("doc_id") % 7 + 1).cast("int")))
        .filter(!col("host").isin(urlBlocklist: _*))
        .withColumn("host_rank", row_number().over(w))
        .filter(col("host_rank") <= 40)
      val planted = when(col("doc_id") % 4 === 1, lit(" привет мир"))
        .when(col("doc_id") % 4 === 2, lit(" γεια σου κόσμε"))
        .when(col("doc_id") % 4 === 3, lit(" 你好世界"))
        .otherwise(lit(""))
      val s2 = s1.withColumn("t2", concat(col("text"), planted))
        .filter((length(col("t2")) - length(regexp_replace(col("t2"),
          "[\\p{IsCyrillic}\\p{IsGreek}\\p{IsHan}]", ""))) === 0)
        .select(col("doc_id"), col("host"), col("text"))
      val t = s2
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .filter(size(col("toks")) >= 5)
      val nChunks = ceil(size(col("toks")).cast("double") / 10.0).cast("int")
      val chunks = transform(sequence(lit(0), nChunks - 1),
        g => concat_ws(" ", slice(col("toks"), g * 10 + 1, lit(10))))
      val built = t.withColumn("chunks", chunks)
        .withColumn("lines",
          concat(col("chunks"),
            when(col("doc_id") % 3 === 0, slice(col("chunks"), 1, 1))
              .otherwise(slice(col("chunks"), 1, 0)),
            when(col("doc_id") % 7 === 0,
                array(concat_ws(" ", slice(col("toks"), 1, 5))))
              .otherwise(slice(col("chunks"), 1, 0))))
        .withColumn("toks2",
          flatten(transform(col("lines"), l => split(l, " "))))
      // LINEAGE CUT before filtering on raw signals: PushDownPredicates
      // substitutes the signal aliases into the pushed predicate,
      // re-inlining the staged arrays into lambda bodies — the exact
      // re-evaluation blowup withSignals' column binding exists to
      // prevent (measured: sf0.001 ran 13+ min; with the cut, seconds).
      // A lazy localCheckpoint is the q_llm_data_pipeline boundary
      // pattern: the post-signals frame is a natural materialization
      // point (narrow: ids + scalars + text), and at 100 TB this is
      // where a real pipeline lands its scored corpus anyway.
      val sig = RepetitionSignals.withSignals(built, "lines", "toks2")
        .select(col("doc_id"), col("host"), col("text"),
          col("rep_dup_line_frac"), col("rep_top2_frac"),
          size(col("toks2")).as("wc"))
        .transform(graft.plans.Lineage.cut(_))
      val s4 = sig
        .filter(col("rep_dup_line_frac") <= 0.30 &&
          col("rep_top2_frac") <= 0.20)
        .filter(col("wc").between(15, 10000))
        .select(col("doc_id"), col("host"), col("text"))
      val keepers = s4.groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
      // Cut the dedup survivors (r19): without the boundary this
      // semi-join subtree executes THREE times — packByTokenBudget's
      // repartitionByRange samples its child for range bounds (a full
      // pass), the real exchange recomputes it, and the host join-back
      // probes it again. The multimodal pipeline already cuts here;
      // survivors are a row-subset of the already-cut `sig`, so the
      // boundary is bounded by the corpus and the md5 agg + semi-join
      // run once. fp is projected away — the checkpoint carries only
      // what downstream reads.
      val s5 = graft.plans.Lineage.cut(
        s4.withColumn("fp", md5(col("text")))
          .join(keepers, Seq("fp", "doc_id"), "left_semi")
          .select(col("doc_id"), col("host"), col("text")))
      graft.operators.Packing.packByTokenBudget(s5, budget = 1500L)
        .join(s5.select(col("doc_id"), col("host")), Seq("doc_id"))
        .select(col("doc_id"), col("host"), col("n_tokens"), col("pack_id"))
        .orderBy(asc("doc_id"))
    },
    Some(webPipelineSql),
    headline = true)

  private lazy val webPipelineSql: String = {
    val pool = urlDomainPool.map(h => s"'$h'").mkString("[", ", ", "]")
    val blocked = urlBlocklist.map(h => s"'$h'").mkString(", ")
    s"""WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
        h1 AS (
          SELECT doc_id, text, $pool[(doc_id % 7) + 1] AS host
          FROM corpus),
        h2 AS (
          SELECT doc_id, text, host,
            ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id DESC)
              AS host_rank
          FROM h1 WHERE host NOT IN ($blocked)),
        s1 AS (SELECT doc_id, text, host FROM h2 WHERE host_rank <= 40),
        sc AS (
          SELECT doc_id, text, host,
            text || CASE WHEN doc_id % 4 = 1 THEN ' привет мир'
                         WHEN doc_id % 4 = 2 THEN ' γεια σου κόσμε'
                         WHEN doc_id % 4 = 3 THEN ' 你好世界'
                         ELSE '' END AS t2
          FROM s1),
        s2 AS (
          SELECT doc_id, text, host FROM sc
          WHERE length(t2) - length(regexp_replace(t2,
            '[\\p{Cyrillic}\\p{Greek}\\p{Han}]', '', 'g')) = 0),
        t AS (
          SELECT doc_id, host, text, $toksSql AS toks FROM s2
          WHERE len($toksSql) >= 5),
        b AS (
          SELECT doc_id, host, text, toks,
            list_transform(
              generate_series(0, CAST(ceil(len(toks) / 10.0) AS INT) - 1),
              g -> array_to_string(
                     list_slice(toks, g * 10 + 1, g * 10 + 10), ' '))
              AS chunks
          FROM t),
        l AS (
          SELECT doc_id, host, text,
            chunks ||
              (CASE WHEN doc_id % 3 = 0 THEN [chunks[1]] ELSE [] END) ||
              (CASE WHEN doc_id % 7 = 0
                    THEN [array_to_string(list_slice(toks, 1, 5), ' ')]
                    ELSE [] END) AS lines
          FROM b),
        tk AS (
          SELECT doc_id, host, text, lines,
            flatten(list_transform(lines, x -> string_split(x, ' ')))
              AS toks2
          FROM l),
        g AS (
          SELECT doc_id, host, text, lines, toks2,
            length(list_aggregate(toks2, 'string_agg', '')) AS total_chars,
            ${gramsSql("toks2", 2)} AS g2
          FROM tk),
        sb AS (
          SELECT doc_id, host, text, lines, toks2, total_chars,
            ${bestSql(2)}
          FROM g),
        m AS (
          SELECT doc_id, host, text, toks2,
            CASE WHEN len(lines) = 0 THEN 0.0
              ELSE 1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
              END AS dup_line_frac,
            ${topSql(2)} AS top2_frac
          FROM sb),
        s4 AS (
          SELECT doc_id, host, text FROM m
          WHERE dup_line_frac <= 0.30 AND top2_frac <= 0.20
            AND len(toks2) BETWEEN 15 AND 10000),
        k AS (
          SELECT md5(text) AS fp, MIN(doc_id) AS keep_id
          FROM s4 GROUP BY 1),
        s5 AS (
          SELECT s4.doc_id, s4.host, s4.text FROM s4
          JOIN k ON md5(s4.text) = k.fp AND s4.doc_id = k.keep_id),
        c AS (
          SELECT doc_id, host, len($toksSql) AS n_tokens,
            COALESCE(SUM(len($toksSql)) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cum_excl
          FROM s5)
        SELECT doc_id, host, CAST(n_tokens AS BIGINT) AS n_tokens,
          CAST(cum_excl // 1500 AS BIGINT) AS pack_id
        FROM c ORDER BY doc_id"""
  }

  // ---- multimodal web-corpus pipeline COMPOSITION (round 11) ---------
  // The q_web_pipeline convention with MEDIA PAYLOADS curated jointly
  // with the text — the builder brief's multimodal-columns requirement
  // composed, not just per-operator: per-host newest-40 cap → script
  // routing → token floor → REAL image+audio encode/decode for the
  // SURVIVORS ONLY (decode is the expensive stage; text curation runs
  // first, the production ordering) → media quality filter on decoded
  // stats → exact text dedup (min-id keeper; clones at +1e6 keep their
  // media arithmetic mod 16/50, so a surviving original forces real
  // dedup work) → token-budget packing. Lineage cuts at the two
  // natural boundaries: post-text-curation (three consumers — both
  // media synthesizers and the join spine) and post-dedup (packing +
  // final projection). Every decoded statistic is integer arithmetic
  // in doc_id, so the full five-stage composition — two codecs, three
  // filters, dedup, packing — replays in pure SQL.
  private val multimodalPipeline = GraftQuery(
    "q_multimodal_pipeline",
    (s, d) => {
      import graft.operators.Multimodal
      val pool = array(urlDomainPool.map(lit): _*)
      val base = documents(s, d).select(col("doc_id"), col("text"))
      val corpus = base.unionByName(
        base.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("host").orderBy(desc("doc_id"))
      val s1 = corpus
        .withColumn("host",
          element_at(pool, (col("doc_id") % 7 + 1).cast("int")))
        .filter(!col("host").isin(urlBlocklist: _*))
        .withColumn("host_rank", row_number().over(w))
        .filter(col("host_rank") <= 40)
      val planted = when(col("doc_id") % 4 === 1, lit(" привет мир"))
        .when(col("doc_id") % 4 === 2, lit(" γεια σου κόσμε"))
        .when(col("doc_id") % 4 === 3, lit(" 你好世界"))
        .otherwise(lit(""))
      val s2 = s1.withColumn("t2", concat(col("text"), planted))
        .filter((length(col("t2")) - length(regexp_replace(col("t2"),
          "[\\p{IsCyrillic}\\p{IsGreek}\\p{IsHan}]", ""))) === 0)
        .select(col("doc_id"), col("host"), col("text"))
      // min-token filter ABOVE the cut (r18 pushed-predicate sweep,
      // VERDICT r17 #8): inside the cut argument Catalyst pushed it
      // below the n_tokens projection, tokenizing every row a second
      // time in an interpreted Filter
      val s3 = graft.plans.Lineage.cut(
        s2.withColumn("n_tokens",
            size(TextFunctions.tokens(col("text"))).cast("long")))
        .filter(col("n_tokens") >= 20)
      val imgF = Multimodal.imageFeaturesById(
          s, Multimodal.synthesizeImages(s, s3)).toDF()
        .select(col("doc_id"), col("width"), col("n_px"))
      val audF = Multimodal.audioFeaturesById(
          s, Multimodal.synthesizeAudio(s, s3)).toDF()
        .select(col("doc_id"), col("n_frames"))
      val s4 = s3.join(imgF, "doc_id").join(audF, "doc_id")
        .filter(col("width") >= 32 && col("n_frames") >= 120)
      val keepers = s4.groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
      val s5 = graft.plans.Lineage.cut(
        s4.withColumn("fp", md5(col("text")))
          .join(keepers, Seq("fp", "doc_id"), "left_semi"))
      graft.operators.Packing.packByTokenBudget(s5, budget = 1500L)
        .join(s5.select(col("doc_id"), col("host"), col("width"),
          col("n_px"), col("n_frames")), Seq("doc_id"))
        .select(col("doc_id"), col("host"), col("width"), col("n_px"),
          col("n_frames"), col("n_tokens"), col("pack_id"))
        .orderBy(asc("doc_id"))
    },
    Some(multimodalPipelineSql))

  private lazy val multimodalPipelineSql: String = {
    val pool = urlDomainPool.map(h => s"'$h'").mkString("[", ", ", "]")
    val blocked = urlBlocklist.map(h => s"'$h'").mkString(", ")
    s"""WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
        h1 AS (
          SELECT doc_id, text, $pool[(doc_id % 7) + 1] AS host
          FROM corpus),
        h2 AS (
          SELECT doc_id, text, host,
            ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id DESC)
              AS host_rank
          FROM h1 WHERE host NOT IN ($blocked)),
        s1 AS (SELECT doc_id, text, host FROM h2 WHERE host_rank <= 40),
        sc AS (
          SELECT doc_id, text, host,
            text || CASE WHEN doc_id % 4 = 1 THEN ' привет мир'
                         WHEN doc_id % 4 = 2 THEN ' γεια σου κόσμε'
                         WHEN doc_id % 4 = 3 THEN ' 你好世界'
                         ELSE '' END AS t2
          FROM s1),
        s2 AS (
          SELECT doc_id, text, host FROM sc
          WHERE length(t2) - length(regexp_replace(t2,
            '[\\p{Cyrillic}\\p{Greek}\\p{Han}]', '', 'g')) = 0),
        s3 AS (
          SELECT doc_id, host, text, len($toksSql) AS n_tokens
          FROM s2 WHERE len($toksSql) >= 20),
        mm AS (
          SELECT doc_id, host, text, n_tokens,
            (doc_id % 16) * 4 + 8 AS width,
            ((doc_id % 16) * 4 + 8) * ((doc_id % 12) * 4 + 8) AS n_px,
            (doc_id % 50) * 4 + 40 AS n_frames
          FROM s3),
        s4 AS (SELECT * FROM mm WHERE width >= 32 AND n_frames >= 120),
        k AS (
          SELECT md5(text) AS fp, MIN(doc_id) AS keep_id
          FROM s4 GROUP BY 1),
        s5 AS (
          SELECT s4.* FROM s4
          JOIN k ON md5(s4.text) = k.fp AND s4.doc_id = k.keep_id),
        c AS (
          SELECT doc_id, host, width, n_px, n_frames, n_tokens,
            COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cum_excl
          FROM s5)
        SELECT doc_id, host, CAST(width AS INTEGER) AS width,
          CAST(n_px AS BIGINT) AS n_px,
          CAST(n_frames AS BIGINT) AS n_frames,
          CAST(n_tokens AS BIGINT) AS n_tokens,
          CAST(cum_excl // 1500 AS BIGINT) AS pack_id
        FROM c ORDER BY doc_id"""
  }

  // ---- benchmark decontamination (word n-gram overlap) --------------------
  // (q_web_pipeline is a headline: TimeQ band 1.2–4 s from a 1.56 s
  // warm floor — BASELINE round 10, third session.)
  // The benchmark side collapses to a DISTINCT n-gram set before the
  // join: eval suites are tiny relative to the corpus, so this side
  // broadcasts and the 100 TB corpus side never shuffles — each corpus
  // partition probes the broadcast set locally, then one doc_id-keyed
  // aggregation counts hits.
  private val decontaminate = GraftQuery(
    "q_decontaminate",
    (s, d) => {
      val grams = documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 4)
        .select(col("doc_id"), explode(array_distinct(ngrams(col("toks"), 4))).as("g"))
      val bench = grams.filter(col("doc_id") % 25 === 0)
        .select(col("g")).distinct()
      grams.filter(col("doc_id") % 25 =!= 0)
        .join(broadcast(bench), "g")
        .groupBy("doc_id").agg(count(lit(1)).as("overlap_ngrams"))
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, $toksSql AS toks FROM documents
               WHERE len($toksSql) >= 4),
             grams AS (
               SELECT doc_id, unnest(list_distinct(${ngramsSql(4)})) AS g
               FROM t),
             bench AS (
               SELECT DISTINCT g FROM grams WHERE doc_id % 25 = 0)
             SELECT doc_id, COUNT(*) AS overlap_ngrams
             FROM grams JOIN bench USING (g)
             WHERE doc_id % 25 <> 0
             GROUP BY doc_id ORDER BY doc_id"""))

  // ---- FUZZY decontamination (minhash-LSH near-dup vs the eval set) --
  // The near-dup extension of q_decontaminate: a planted eval set is
  // built from every 25th document with its FIRST TOKEN substituted —
  // an edit the exact n-gram join can shrug off but a paraphrased leak
  // shape fuzzy matching must catch. Recovery is the planted-recall
  // oracle (q_embedding_neardup convention): a one-token edit leaves
  // bigram-set Jaccard ≥ 0.8 even for the shortest (10-token) docs
  // (the first token sits in one bigram: (s−1)/(s+1) at s = 9),
  // far above the 0.3 verify threshold, and the 32×2 band geometry
  // makes a bucket miss ~5e-8 — so every planted eval doc MUST flag
  // its source, SQL-decidably, while the xxhash bucket geometry itself
  // stays un-replayable. Natural near-dup flags may also surface
  // (legitimate decontamination behavior); the count pins only the
  // planted guarantee.
  private val decontaminateFuzzy = GraftQuery(
    "q_decontaminate_fuzzy",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      val evalSet = docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          regexp_replace(col("text"), "^\\S+", "evalmark").as("text"))
      val pairs = graft.operators.Dedup.fuzzyDecontaminate(docs, evalSet)
      val planted = evalSet.agg(count(lit(1)).as("n_planted"))
      val found = pairs
        .filter(col("doc_id") === col("eval_id") - 10000000L)
        .agg(countDistinct(col("eval_id")).as("n_found"))
      planted.crossJoin(found).select(
        col("n_planted"), col("n_found"),
        (col("n_planted") === col("n_found")).as("all_found"))
    },
    Some("""SELECT COUNT(*) AS n_planted, COUNT(*) AS n_found,
              TRUE AS all_found
            FROM documents WHERE doc_id % 25 = 0"""))

  // ---- HTML-front-end pipeline COMPOSITION ---------------------------
  // The composition gate for the markup front end: HTML-wrapped corpus
  // (title carries doc_id in the HEAD ONLY — body text is id-free, so
  // exact clones stay exact after extraction) → htmlToText/htmlTitle →
  // extracted-token floor → exact dedup on the EXTRACTED text (planted
  // clones of every 5th doc must drop) → token-budget packing. One
  // lazy plan; the oracle replays markup planting, the identical
  // regex-chain extraction (HtmlText.htmlToTextSql), the floor, the
  // min-id keeper, and the prefix-sum pack ids.
  private val htmlPipeP1 = "<html><head><title>Doc "
  private val htmlPipeP2 = "</title><script>if (1 < 2) { track(\"<b>x</b>\") }</script>" +
    "</head><body><h1>Article</h1><p>"
  private val htmlPipeP3 = "</p><div>footer &amp; links</div></body></html>"
  private val htmlPipeline = GraftQuery(
    "q_html_pipeline",
    (s, d) => {
      val base = documents(s, d).select(col("doc_id"), col("text"))
      val corpus = base.unionByName(
        base.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val raw = concat(lit(htmlPipeP1), col("doc_id"), lit(htmlPipeP2),
        col("text"), lit(htmlPipeP3))
      val ext = corpus.select(col("doc_id"),
        graft.functions.HtmlText.htmlTitle(raw).as("title"),
        graft.functions.HtmlText.htmlToText(raw).as("txt"))
      val q = ext
        .withColumn("wc", size(TextFunctions.tokens(col("txt"))))
        .filter(col("wc") >= 15)
      val keepers = q.groupBy(md5(col("txt")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
      // Cut the dedup survivors (r19, the q_web_pipeline boundary):
      // uncut, the HTML extraction + tokenize tower under this
      // semi-join re-executes for the range-partitioner sampling pass,
      // the real exchange, AND the title join-back — three full
      // extractions of the corpus. One materialization of the
      // survivors (id, title, extracted text) runs it once.
      val s5 = graft.plans.Lineage.cut(
        q.withColumn("fp", md5(col("txt")))
          .join(keepers, Seq("fp", "doc_id"), "left_semi")
          .select(col("doc_id"), col("title"), col("txt")))
      graft.operators.Packing.packByTokenBudget(
          s5.select(col("doc_id"), col("txt").as("text")), budget = 1500L)
        .join(s5.select(col("doc_id"), col("title")), Seq("doc_id"))
        .select(col("doc_id"), col("title"), col("n_tokens"), col("pack_id"))
        .orderBy(asc("doc_id"))
    },
    Some {
      val h = s"'$htmlPipeP1' || doc_id || '$htmlPipeP2' || text || " +
        s"'$htmlPipeP3'"
      val toks = "list_filter(string_split_regex(trim(txt), '\\s+'), x -> x <> '')"
      s"""WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
          ext AS (
            SELECT doc_id,
              ${graft.functions.HtmlText.htmlTitleSql(s"($h)")} AS title,
              ${graft.functions.HtmlText.htmlToTextSql(s"($h)")} AS txt
            FROM corpus),
          q AS (
            SELECT doc_id, title, txt, len($toks) AS wc
            FROM ext WHERE len($toks) >= 15),
          k AS (
            SELECT md5(txt) AS fp, MIN(doc_id) AS keep_id
            FROM q GROUP BY 1),
          s5 AS (
            SELECT q.* FROM q
            JOIN k ON md5(q.txt) = k.fp AND q.doc_id = k.keep_id),
          c AS (
            SELECT doc_id, title, wc,
              COALESCE(SUM(wc) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS cum_excl
            FROM s5)
          SELECT doc_id, title, CAST(wc AS BIGINT) AS n_tokens,
            CAST(cum_excl // 1500 AS BIGINT) AS pack_id
          FROM c ORDER BY doc_id"""
    })

  // ---- mixture reweighting to a target distribution ------------------
  // Per-source sampling weight that flattens the corpus to a uniform
  // mix: weight = target_frac / actual_frac. The aggregate output is
  // k rows (one per source), so the window over it is driver-trivial;
  // at scale only the groupBy shuffles, on a low-cardinality key that
  // partial (map-side) aggregation collapses first.
  private val domainMix = GraftQuery(
    "q_domain_mix",
    (s, d) => {
      val counts = documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      counts
        .withColumn("frac",
          round(col("n") / sum(col("n")).over(w), 6))
        .withColumn("weight",
          round((sum(col("n")).over(w) / count(lit(1)).over(w)) / col("n"), 6))
        .orderBy(asc("source"))
    },
    Some("""WITH counts AS (
              SELECT source, COUNT(*) AS n FROM documents GROUP BY source)
            SELECT source, n,
              ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS frac,
              ROUND((SUM(n) OVER () / CAST(COUNT(*) OVER () AS DOUBLE)) / n, 6) AS weight
            FROM counts ORDER BY source"""))

  // ---- corpus trigram frequency table --------------------------------
  private val trigramFreq = GraftQuery(
    "q_trigram_freq",
    (s, d) => {
      val t = documents(s, d)
        .select(TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
      t.select(explode(ngrams(col("toks"), 3)).as("tg"))
        .groupBy("tg").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("tg"))
        .limit(30)
    },
    Some(s"""WITH t AS (
               SELECT $toksSql AS toks FROM documents
               WHERE len($toksSql) >= 3),
             tg AS (
               SELECT unnest(${ngramsSql(3)}) AS tg FROM t)
             SELECT tg, COUNT(*) AS n FROM tg
             GROUP BY tg ORDER BY n DESC, tg LIMIT 30"""))

  // ---- composite Gopher-style rule filter ----------------------------
  // Word-count bounds + mean-word-length bounds, with the FIRST failing
  // rule as the drop reason (rule order is part of the contract).
  private val gopherFilter = GraftQuery(
    "q_gopher_filter",
    (s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      t.select(
          col("doc_id"),
          size(col("toks")).as("wc"),
          (length(array_join(col("toks"), "")).cast("double") /
            size(col("toks")).cast("double")).as("mwl"))
        .select(
          col("doc_id"), col("wc"), round(col("mwl"), 6).as("mean_word_len"),
          when(col("wc") < 15, lit("too_short"))
            .when(col("wc") > 10000, lit("too_long"))
            .when(col("mwl") < 2.0, lit("short_words"))
            .when(col("mwl") > 10.0, lit("long_words"))
            .otherwise(lit("keep")).as("verdict"))
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, $toksSql AS toks FROM documents),
             m AS (
               SELECT doc_id, len(toks) AS wc,
                 CAST(len(list_aggregate(toks, 'string_agg', '')) AS DOUBLE) /
                   CAST(len(toks) AS DOUBLE) AS mwl
               FROM t)
             SELECT doc_id, wc, ROUND(mwl, 6) AS mean_word_len,
               CASE WHEN wc < 15 THEN 'too_short'
                    WHEN wc > 10000 THEN 'too_long'
                    WHEN mwl < 2.0 THEN 'short_words'
                    WHEN mwl > 10.0 THEN 'long_words'
                    ELSE 'keep' END AS verdict
             FROM m ORDER BY doc_id"""))

  // ---- cross-source duplicate detection ------------------------------
  // Which src0 documents also appear (same content) under another
  // source — the cross-corpus exact-dedup primitive (md5 keys it
  // cross-engine; at 100 TB both sides reduce to distinct
  // (fingerprint, source) pairs before the join, so the join input is
  // bounded by distinct content, not corpus size).
  private val crossSourceDup = GraftQuery(
    "q_cross_source_dup",
    (s, d) => {
      // the base corpus has no cross-source exact clones, so plant a
      // mirrored slice under a synthetic source (same construction the
      // other dedup gates use for ground truth)
      val base = documents(s, d).select(col("doc_id"), col("text"), col("source"))
      val planted = base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
                lit("srcX").as("source"))
      val fp = base.unionByName(planted)
        .select(col("doc_id"), col("source"), md5(col("text")).as("fp"))
      val others = fp.filter(col("source") =!= "src0")
        .select(col("fp"), col("source").as("dup_source")).distinct()
      fp.filter(col("source") === "src0")
        .join(others, "fp")
        .groupBy("doc_id")
        .agg(countDistinct(col("dup_source")).as("n_other_sources"))
        .orderBy(asc("doc_id"))
    },
    Some("""WITH corpus AS (
              SELECT doc_id, text, source FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text, 'srcX' FROM documents
              WHERE doc_id % 7 = 0),
            fp AS (
              SELECT doc_id, source, md5(text) AS fp FROM corpus),
            others AS (
              SELECT DISTINCT fp, source AS dup_source FROM fp
              WHERE source <> 'src0')
            SELECT f.doc_id,
              COUNT(DISTINCT o.dup_source) AS n_other_sources
            FROM fp f JOIN others o USING (fp)
            WHERE f.source = 'src0'
            GROUP BY f.doc_id ORDER BY f.doc_id"""))

  // ---- deterministic train/val/test split ----------------------------
  // Content-keyed md5 threshold split (≈80/10/10): stable under
  // re-partitioning, re-runs, and engine choice — the property random()
  // splits lack. The hex-string comparison is the cross-engine contract
  // (md5 output is lowercase hex in both engines).
  private val trainSplit = GraftQuery(
    "q_train_split",
    (s, d) => {
      val h = md5(concat(col("doc_id").cast("string"), lit(":split")))
      documents(s, d)
        .withColumn("split",
          when(h < lit("cc"), "train")        // [0, 0.8) of hex space
            .when(h < lit("e6"), "val")       // [0.8, 0.9)
            .otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"))
        .orderBy(asc("lang"), asc("split"))
    },
    Some("""WITH s AS (
              SELECT lang,
                CASE
                  WHEN md5(CAST(doc_id AS VARCHAR) || ':split') < 'cc'
                    THEN 'train'
                  WHEN md5(CAST(doc_id AS VARCHAR) || ':split') < 'e6'
                    THEN 'val'
                  ELSE 'test' END AS split
              FROM documents)
            SELECT lang, split, COUNT(*) AS n FROM s
            GROUP BY lang, split ORDER BY lang, split"""))

  // ---- data-quality constraint checks --------------------------------
  // Expectations as one relational pass each: null rate, range
  // violations, referential orphans (anti-join), duplicate keys. One
  // row per check, so the gate pins both the counts and the verdicts.
  private val dqChecks = GraftQuery(
    "q_dq_checks",
    (s, d) => {
      val li = lineitem(s, d)
      val ord = orders(s, d)
      val nullQty = li.filter(col("l_quantity").isNull)
        .agg(count(lit(1)).as("violations"))
        .select(lit("null_quantity").as("check"), col("violations"))
      val negPrice = li.filter(col("l_extendedprice") <= 0)
        .agg(count(lit(1)).as("violations"))
        .select(lit("nonpositive_price").as("check"), col("violations"))
      val orphans = li.join(ord, li("l_orderkey") === ord("o_orderkey"),
          "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("orphan_lineitem").as("check"), col("violations"))
      val dupOrders = ord.groupBy("o_orderkey")
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
        .agg(count(lit(1)).as("violations"))
        .select(lit("duplicate_orderkey").as("check"), col("violations"))
      nullQty.unionByName(negPrice).unionByName(orphans).unionByName(dupOrders)
        .withColumn("passed", when(col("violations") === 0, 1).otherwise(0))
        .orderBy(asc("check"))
    },
    Some("""SELECT * FROM (
              SELECT 'null_quantity' AS check, COUNT(*) AS violations,
                CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END AS passed
              FROM lineitem WHERE l_quantity IS NULL
              UNION ALL
              SELECT 'nonpositive_price', COUNT(*),
                CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END
              FROM lineitem WHERE l_extendedprice <= 0
              UNION ALL
              SELECT 'orphan_lineitem', COUNT(*),
                CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END
              FROM lineitem l WHERE NOT EXISTS (
                SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
              UNION ALL
              SELECT 'duplicate_orderkey', COUNT(*),
                CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END
              FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey
                    HAVING COUNT(*) > 1))
            ORDER BY "check""""))

  // ---- weighted sampling (Efraimidis–Spirakis, deterministic) --------
  // Top-20 documents by u^(1/n_chars): longer docs proportionally more
  // likely, content-keyed so the draw replays exactly in the oracle.
  private val weightedSample = GraftQuery(
    "q_weighted_sample",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc("sk"), asc("doc_id"))
      documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          graft.operators.Sampling
            .weightedKey(col("doc_id"), col("n_chars")).as("sk"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 20)
        .select(col("rank"), col("doc_id"), col("lang"),
                round(col("sk"), 6).as("sample_key"))
        .orderBy(asc("rank"))
    },
    Some("""WITH keyed AS (
              SELECT doc_id, lang,
                pow((CAST(('0x' || substr(
                        md5(CAST(doc_id AS VARCHAR) || ':ws'), 1, 8))
                      AS BIGINT) + 0.5) / 4294967296.0,
                    1.0 / CAST(n_chars AS DOUBLE)) AS sk
              FROM documents),
            ranked AS (
              SELECT doc_id, lang, sk,
                ROW_NUMBER() OVER (ORDER BY sk DESC, doc_id) AS rank
              FROM keyed)
            SELECT CAST(rank AS INTEGER) AS rank, doc_id, lang,
              ROUND(sk, 6) AS sample_key
            FROM ranked WHERE rank <= 20 ORDER BY rank"""))

  // ---- BPE tokenizer training: adjacent-symbol pair counts -----------
  // The counting step every BPE merge iteration argmaxes over
  // (Sennrich et al. 2016): char symbols + terminal '</w>', pair
  // counts weighted by word frequency. The corpus-sized work is ONE
  // explode+groupBy to the vocab-bounded word table; the pair table is
  // bounded by |alphabet|². Merge iteration + application are
  // spec-pinned in BpeSpec (the classic low/lower/newest/widest merges
  // hand-computed); the oracle pins the full weighted pair table.
  private val bpePairs = GraftQuery(
    "q_bpe_pairs",
    (s, d) => {
      val toks = documents(s, d)
        .select(TextFunctions.tokens(col("text")).as("toks"))
      graft.operators.Bpe.pairCounts(
          graft.operators.Bpe.wordSymbolCounts(toks, "toks"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
    },
    Some(s"""WITH w AS (
               SELECT unnest($toksSql) AS word FROM documents),
             wc AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word),
             sy AS (
               SELECT freq,
                 list_append(list_transform(
                   generate_series(1, length(word)),
                   i -> substr(word, i, 1)), '</w>') AS syms
               FROM wc),
             p AS (
               SELECT unnest(list_transform(
                 generate_series(1, len(syms) - 1),
                 i -> {'freq': freq, 'a': syms[i], 'b': syms[i + 1]}))
                 AS u
               FROM sy)
             SELECT u.a AS a, u.b AS b, CAST(SUM(u.freq) AS BIGINT) AS cnt
             FROM p GROUP BY 1, 2 ORDER BY cnt DESC, a, b"""))

  // ---- token-budget corpus packing (distributed prefix sum) ----------
  // Chunk the id-ordered corpus into ≈2000-token packs — the sharding
  // step that turns a tokenized corpus into trainer work units. The
  // oracle is the straightforward global window cumsum; the Spark side
  // must reproduce it WITHOUT a global single-partition sort (two-pass
  // range-partitioned prefix sum — plan shape pinned in PackingSpec).
  private val tokenPacking = GraftQuery(
    "q_token_packing",
    (s, d) =>
      graft.operators.Packing.packByTokenBudget(documents(s, d), budget = 2000L)
        .groupBy("pack_id")
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_tokens")).as("pack_tokens"))
        .orderBy(asc("pack_id")),
    Some(s"""WITH t AS (
               SELECT doc_id, len($toksSql) AS n_tokens FROM documents),
             c AS (
               SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_excl
               FROM t)
             SELECT CAST(cum_excl // 2000 AS BIGINT) AS pack_id,
                    CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
             FROM c GROUP BY 1 ORDER BY 1"""),
    headline = true)

  /** Concat-and-split sequence forming (GPT-style fixed-length packing,
    * docs spanning sequence boundaries) — per-doc global offset and
    * sequence range; oracle = the naive global-window cumsum.
    */
  private val packSequences = GraftQuery(
    "q_pack_sequences",
    (s, d) =>
      graft.operators.Packing.packFixedLength(documents(s, d), seqLen = 512L)
        .orderBy(asc("doc_id")),
    Some(s"""WITH t AS (
               SELECT doc_id, len($toksSql) AS n_tokens FROM documents),
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

  // ---- BPE training end-to-end (round 10) ----------------------------
  // A literal mini-corpus (db-vocabulary words with fixed frequencies)
  // trained IN-ENGINE through the full trainFast path — distributed
  // wordSymbolCounts + the driver-side merge loop — against a merge
  // list computed at REGISTRATION time by Bpe.trainLocal over the
  // hand-built (freq, symbols) table and baked into static VALUES.
  // What this gates that q_bpe_pairs (corpus half) and BpeSpec (loop
  // parity) do not: the collected distributed word table drives the
  // loop to the exact expected merges, end to end, through the driver
  // harness.
  private val bpeLitCorpus: Seq[(String, Int)] = Seq(
    "scan" -> 6, "can" -> 4, "join" -> 5, "hash" -> 3, "row" -> 7,
    "batch" -> 2, "merge" -> 4, "scatter" -> 1)

  private val bpeNumMerges = 6

  /** Registration-time expected merges via the shared driver loop over
    * a hand-computed symbol table (chars + the `</w>` terminal).
    */
  private val bpeExpectedMerges: Seq[(String, String)] =
    graft.operators.Bpe.trainLocal(
      bpeLitCorpus.map { case (w, n) =>
        (n.toLong, (w.map(_.toString) :+ "</w>").toIndexedSeq)
      }, bpeNumMerges)

  private val bpeTrain = GraftQuery(
    "q_bpe_train",
    (s, d) => {
      import s.implicits._
      val toks = bpeLitCorpus.flatMap { case (w, n) => Seq.fill(n)(w) }
      val docs = Seq((1L, toks)).toDF("doc_id", "toks")
      graft.operators.Bpe.trainFast(docs, "toks", bpeNumMerges)
        .zipWithIndex
        .map { case ((a, b), i) => (i + 1L, a, b) }
        .toDF("rank", "a", "b")
        .orderBy(asc("rank"))
    },
    Some(s"""SELECT * FROM (VALUES ${bpeExpectedMerges.zipWithIndex
               .map { case ((a, b), i) =>
                 s"(CAST(${i + 1} AS BIGINT), '$a', '$b')" }
               .mkString(", ")}) AS t(rank, a, b) ORDER BY rank"""))

  // ---- BPE tokenization over the real corpus -------------------------
  // applyMerges with the SAME trained literal merge list, over the
  // documents vocabulary (every 20th doc; lowercase-alpha words only so
  // the oracle's |-delimited string replay is unambiguous). The oracle
  // replays the greedy left-to-right no-re-merge fold as one
  // regexp_replace per merge over a '|sym|'-delimited rendering: each
  // match consumes both full delimiters, so adjacent candidates cannot
  // overlap and RE2's leftmost-nonoverlapping 'g' semantics equal the
  // engine fold's (the "aaa" case: |a||a||a| → |aa||a|).
  private val bpeTokenize = GraftQuery(
    "q_bpe_tokenize",
    (s, d) => {
      val docs = documents(s, d)
        .filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      graft.operators.Bpe
        .applyMerges(docs, "doc_id", "toks", bpeExpectedMerges)
        .filter(col("word").rlike("^[a-z]+$"))
        .select(col("doc_id"), col("word_pos").cast("long").as("word_pos"),
          col("word"), array_join(col("pieces"), " ").as("pieces_str"))
        .orderBy(asc("doc_id"), asc("word_pos"))
    },
    Some(bpeTokenizeSql))

  // ---- BPE encode via the custom codegen expression ------------------
  // Same words, same merges, same oracle — but the engine path is
  // functions.BpeEncode (min-rank iterative loop, O(len²) independent
  // of merge-table size) instead of applyMerges' in-order fold
  // (O(numMerges × len) per word — fine for a gate's handful of
  // merges, prohibitive at a real tokenizer's 30k–50k). Two engine
  // implementations against one SQL replay pins the documented
  // trained-list equivalence end-to-end through the driver harness.
  private val bpeEncodeExpr = GraftQuery(
    "q_bpe_encode_expr",
    (s, d) => {
      graft.plans.GraftFunctions.register(s)
      val docs = documents(s, d)
        .filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      docs.select(col("doc_id"),
          posexplode(col("toks")).as(Seq("i", "word")))
        .filter(col("word").rlike("^[a-z]+$"))
        .select(col("doc_id"), (col("i") + 1).cast("long").as("word_pos"),
          col("word"),
          array_join(graft.functions.BpeEncode
            .bpe_encode(col("word"), bpeExpectedMerges), " ")
            .as("pieces_str"))
        .orderBy(asc("doc_id"), asc("word_pos"))
    },
    Some(bpeTokenizeSql))

  private lazy val bpeTokenizeSql: String = {
      val chain = bpeExpectedMerges.zipWithIndex.foldLeft("st0") {
        case (prev, ((a, b), i)) =>
          s"regexp_replace($prev, '\\|$a\\|\\|$b\\|', '|$a$b|', 'g')"
      }
      s"""WITH t AS (
            SELECT doc_id, $toksSql AS toks FROM documents
            WHERE doc_id % 20 = 0),
          w AS (
            SELECT doc_id, i AS word_pos, toks[i] AS word
            FROM t, unnest(generate_series(1, len(toks))) AS u(i)
            WHERE regexp_matches(toks[i], '^[a-z]+$$')),
          s0 AS (
            SELECT doc_id, word_pos, word,
              array_to_string(list_transform(
                generate_series(1, length(word)),
                i -> '|' || substr(word, i, 1) || '|'), '') || '|</w>|'
                AS st0
            FROM w)
          SELECT doc_id, CAST(word_pos AS BIGINT) AS word_pos, word,
            replace(trim($chain, '|'), '||', ' ') AS pieces_str
          FROM s0 ORDER BY doc_id, word_pos"""
  }

  // ---- BPE encode from a STORED merge table --------------------------
  // The ship-the-artifact lifecycle: the trained merge list is written
  // as a version-stamped parquet table (rank column carries order;
  // end_mark rides in the stamp — TokenizerStore), read back, and the
  // encode runs from the LOADED artifact. Same oracle as
  // q_bpe_encode_expr: storage must be semantics-neutral. Stale/foreign/
  // wrong-kind rejection is spec-pinned in TokenizerStoreSpec.
  private val bpeStored = GraftQuery(
    "q_bpe_stored",
    (s, d) => {
      graft.plans.GraftFunctions.register(s)
      val path = s"${GateStates.dir}/" +
        s"bpe_merges_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.operators.TokenizerStore.saveBpeMerges(s, bpeExpectedMerges,
        path)
      val (loaded, endMark) =
        graft.operators.TokenizerStore.loadBpeMerges(s, path)
      val docs = documents(s, d)
        .filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      docs.select(col("doc_id"),
          posexplode(col("toks")).as(Seq("i", "word")))
        .filter(col("word").rlike("^[a-z]+$"))
        .select(col("doc_id"), (col("i") + 1).cast("long").as("word_pos"),
          col("word"),
          array_join(graft.functions.BpeEncode
            .bpe_encode(col("word"), loaded, endMark), " ")
            .as("pieces_str"))
        .orderBy(asc("doc_id"), asc("word_pos"))
    },
    Some(bpeTokenizeSql))

  // ---- byte-level BPE (GPT-2 lineage) --------------------------------
  // The fourth tokenizer family member: a word's UTF-8 BYTES are the
  // base alphabet, each rendered printable by the fixed 256-entry
  // bytes-to-unicode bijection — so NO word is ever OOV and
  // decode∘encode is the identity (round-trip spec-pinned in
  // ByteBpeSpec). Merges train at registration over a literal corpus
  // with real multi-byte mass (accents, CJK, emoji) via the shared
  // trainLocal loop on byte symbols; the gate encodes real [a-z] corpus
  // words PLUS planted non-ASCII words, and the oracle replays the
  // whole path — hex(encode(word)) byte walk → 256-entry map literal →
  // the regexp_replace merge chain — to full value equality, including
  // the byte-symbol rendering and the SQL-side identity round-trip.
  private val byteBpeLitCorpus: Seq[(String, Int)] = Seq(
    "déjà" -> 6, "niño" -> 5, "café" -> 4, "scan" -> 6, "row" -> 7,
    "中文" -> 3, "naïve" -> 2, "caf🙂" -> 1)

  private val byteBpeNumMerges = 8

  private val byteBpeExpectedMerges: Seq[(String, String)] =
    graft.operators.Bpe.trainLocal(
      byteBpeLitCorpus.map { case (w, n) =>
        (n.toLong, graft.functions.ByteMap.toByteSymbols(w)
          .map(_.toString).toIndexedSeq)
      }, byteBpeNumMerges)

  /** 256-entry byte→symbol map as a DuckDB list literal. */
  private lazy val byteMapSqlList: String = (0 until 256).map { b =>
    "'" + graft.functions.ByteMap.byteToChar(b).toString
      .replace("'", "''") + "'"
  }.mkString("[", ", ", "]")

  private def reEsc(s: String): String = s.flatMap { c =>
    if ("\\^$.|?*+()[]{}".contains(c)) "\\" + c else c.toString
  }

  private val byteBpeEncode = GraftQuery(
    "q_bytebpe_encode",
    (s, d) => {
      val docs = documents(s, d).filter(col("doc_id") % 20 === 0)
      val planted = docs.select(col("doc_id"), lit(0L).as("word_pos"),
        element_at(
          array(lit("déjà"), lit("niño"), lit("中文"), lit("caf🙂")),
          (expr("(doc_id div 20) % 4")).cast("int") + 1).as("word"))
      val real = docs
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("i", "word")))
        .filter(col("word").rlike("^[a-z]+$"))
        .select(col("doc_id"), (col("i") + 1).cast("long").as("word_pos"),
          col("word"))
      val enc = graft.functions.ByteBpe
        .byte_bpe_encode(col("word"), byteBpeExpectedMerges)
      planted.unionByName(real)
        .select(col("doc_id"), col("word_pos"), col("word"),
          graft.functions.ByteBpe.byte_syms(col("word")).as("syms"),
          array_join(enc, " ").as("pieces_str"),
          graft.functions.ByteBpe.byte_bpe_decode(enc).as("roundtrip"))
        .orderBy(asc("doc_id"), asc("word_pos"))
    },
    Some {
      val chain = byteBpeExpectedMerges.foldLeft("st0") {
        case (prev, (a, b)) =>
          s"regexp_replace($prev, '\\|${reEsc(a)}\\|\\|${reEsc(b)}\\|', " +
          s"'|$a$b|', 'g')"
      }
      s"""WITH bm AS (SELECT $byteMapSqlList AS m),
          docs AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
          planted AS (
            SELECT doc_id, CAST(0 AS BIGINT) AS word_pos,
              (['déjà', 'niño', '中文', 'caf🙂'])[
                CAST((doc_id // 20) % 4 AS INT) + 1] AS word
            FROM docs),
          real AS (
            SELECT doc_id, CAST(i AS BIGINT) AS word_pos, toks[i] AS word
            FROM (SELECT doc_id, $toksSql AS toks FROM docs),
              unnest(generate_series(1, len(toks))) AS u(i)
            WHERE regexp_matches(toks[i], '^[a-z]+$$')),
          w AS (SELECT * FROM planted UNION ALL SELECT * FROM real),
          sy AS (
            SELECT doc_id, word_pos, word,
              array_to_string(list_transform(
                generate_series(1, octet_length(encode(word))),
                i -> m[('0x' || substr(hex(encode(word)), 2*i-1, 2))::INT
                       + 1]), '') AS syms,
              array_to_string(list_transform(
                generate_series(1, octet_length(encode(word))),
                i -> '|' || m[('0x' || substr(hex(encode(word)), 2*i-1, 2))
                       ::INT + 1] || '|'), '') AS st0
            FROM w CROSS JOIN bm)
          SELECT doc_id, word_pos, word, syms,
            replace(trim($chain, '|'), '||', ' ') AS pieces_str,
            word AS roundtrip
          FROM sy ORDER BY doc_id, word_pos"""
    })

  // ---- unigram-LM tokenizer (SentencePiece family, Kudo 2018) --------
  // The OTHER trained-tokenizer lineage next to BPE: a piece vocabulary
  // with log-probabilities, applied by Viterbi. q_unigram_train runs
  // the full trainFast path (distributed word table + driver EM) over
  // a literal corpus against the vocabulary computed at REGISTRATION
  // time by the shared trainLocal and baked into static VALUES (the
  // q_bpe_train convention). q_unigram_encode runs the
  // custom codegen expression over real corpus words: probe rows carry
  // exact segmentations computed at registration by the independent
  // local Viterbi; every real row carries SQL-statable invariants
  // (pieces concat back to the word; every multi-char piece is
  // in-vocab; the chosen score is ≥ the all-chars baseline — Viterbi
  // optimality against a named alternative), the q_simhash_signatures
  // reduced-form pattern.
  private val uniVocabSize = 24
  private val uniExpectedVocab: Seq[(String, Double)] =
    graft.operators.Unigram.trainLocal(
      bpeLitCorpus.map { case (w, n) => (w, n.toLong) }, uniVocabSize)

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val unigramTrain = GraftQuery(
    "q_unigram_train",
    (s, d) => {
      import s.implicits._
      val toks = bpeLitCorpus.flatMap { case (w, n) => Seq.fill(n)(w) }
      val docs = Seq((1L, toks)).toDF("doc_id", "toks")
      graft.operators.Unigram.trainFast(docs, "toks", uniVocabSize)
        .toDF("piece", "logp")
        .select(col("piece"), round(col("logp"), 6).as("logp"))
        .orderBy(asc("piece"))
    },
    Some(s"""SELECT * FROM (VALUES ${uniExpectedVocab
               .map { case (p, lp) => s"('$p', ${round6(lp)})" }
               .mkString(", ")}) AS t(piece, logp) ORDER BY piece"""))

  // The SentencePiece-shape training path (round 11): likelihood-loss
  // vocab pruning + add-α smoothing, same literal-corpus-vs-baked-VALUES
  // convention as q_unigram_train. vocabSize is set LOW enough that the
  // seeded vocabulary must shrink through several prune iterations (the
  // path under test — usage-rank pruning never runs in this mode), and
  // α=0.5 exercises the smoothed M-step on both the registration-time
  // and engine-side runs of the same arithmetic.
  private val uniPrunedVocabSize = 16
  private val uniPrunedExpected: Seq[(String, Double)] =
    graft.operators.Unigram.trainLocal(
      bpeLitCorpus.map { case (w, n) => (w, n.toLong) }, uniPrunedVocabSize,
      alpha = 0.5, lossPrune = true)

  private val unigramPruned = GraftQuery(
    "q_unigram_pruned",
    (s, d) => {
      import s.implicits._
      val toks = bpeLitCorpus.flatMap { case (w, n) => Seq.fill(n)(w) }
      val docs = Seq((1L, toks)).toDF("doc_id", "toks")
      graft.operators.Unigram.trainFast(docs, "toks", uniPrunedVocabSize,
          alpha = 0.5, lossPrune = true)
        .toDF("piece", "logp")
        .select(col("piece"), round(col("logp"), 6).as("logp"))
        .orderBy(asc("piece"))
    },
    Some(s"""SELECT * FROM (VALUES ${uniPrunedExpected
               .map { case (p, lp) => s"('$p', ${round6(lp)})" }
               .mkString(", ")}) AS t(piece, logp) ORDER BY piece"""))

  private val uniProbeWords = Seq(
    "scan", "scans", "rowhash", "cancan", "scatter", "zzz")
  private val uniProbeSegs: Seq[(Int, String, String)] =
    uniProbeWords.zipWithIndex.map { case (w, i) =>
      (i + 1, w, graft.operators.Unigram
        .viterbiLocal(w, uniExpectedVocab.toMap).mkString(" "))
    }

  private val unigramEncode = GraftQuery(
    "q_unigram_encode",
    (s, d) => {
      graft.plans.GraftFunctions.register(s)
      import s.implicits._
      val vm = map(uniExpectedVocab.flatMap { case (p, lp) =>
        Seq(lit(p), lit(lp)) }: _*)
      def score(arr: org.apache.spark.sql.Column) =
        aggregate(arr, lit(0.0), (acc, p) =>
          acc + coalesce(element_at(vm, p), lit(-100.0)))
      val real = documents(s, d)
        .filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("i", "word")))
        .filter(col("word").rlike("^[a-z]+$"))
        .select(col("doc_id"), (col("i") + 1).cast("long").as("word_pos"),
          col("word"))
        .withColumn("pieces", graft.functions.UnigramEncode
          .unigram_encode(col("word"), uniExpectedVocab))
        .withColumn("chars", filter(split(col("word"), ""), c => c =!= ""))
        .select(lit("real").as("kind"), col("doc_id"), col("word_pos"),
          col("word"), lit(null).cast("string").as("pieces_str"),
          (array_join(col("pieces"), "") === col("word")).as("concat_ok"),
          (size(filter(col("pieces"), p =>
            length(p) > 1 && element_at(vm, p).isNull)) === 0)
            .as("in_vocab_ok"),
          (score(col("pieces")) >= score(col("chars")) - 1e-9)
            .as("score_ok"))
      val probes = uniProbeSegs
        .toDF("word_pos_i", "word", "expected")
        .select(lit("probe").as("kind"), lit(-1L).as("doc_id"),
          col("word_pos_i").cast("long").as("word_pos"), col("word"))
        .withColumn("pieces_str",
          array_join(graft.functions.UnigramEncode
            .unigram_encode(col("word"), uniExpectedVocab), " "))
        .withColumn("concat_ok", lit(true))
        .withColumn("in_vocab_ok", lit(true))
        .withColumn("score_ok", lit(true))
      real.unionByName(probes)
        .orderBy(asc("kind"), asc("doc_id"), asc("word_pos"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, $toksSql AS toks FROM documents
               WHERE doc_id % 20 = 0),
             w AS (
               SELECT doc_id, i AS word_pos, toks[i] AS word
               FROM t, unnest(generate_series(1, len(toks))) AS u(i)
               WHERE regexp_matches(toks[i], '^[a-z]+$$')),
             real AS (
               SELECT 'real' AS kind, doc_id,
                 CAST(word_pos AS BIGINT) AS word_pos, word,
                 CAST(NULL AS VARCHAR) AS pieces_str,
                 TRUE AS concat_ok, TRUE AS in_vocab_ok, TRUE AS score_ok
               FROM w),
             probes AS (
               SELECT 'probe' AS kind, CAST(-1 AS BIGINT) AS doc_id,
                 CAST(rn AS BIGINT) AS word_pos, word, seg AS pieces_str,
                 TRUE AS concat_ok, TRUE AS in_vocab_ok, TRUE AS score_ok
               FROM (VALUES ${uniProbeSegs.map { case (i, w, seg) =>
                 s"($i, '$w', '$seg')" }.mkString(", ")}) AS v(rn, word, seg))
             SELECT * FROM real UNION ALL SELECT * FROM probes
             ORDER BY kind, doc_id, word_pos"""))

  // ---- WordPiece tokenizer (BERT family, Schuster & Nakajima 2012) ---
  // The THIRD subword lineage next to BPE and unigram-LM: pair merges
  // prioritized by likelihood gain count(ab)/(count(a)·count(b)) with
  // `##` continuation symbols, applied by greedy longest-match.
  // q_wordpiece_train runs the full trainFast path over a literal
  // corpus against the merge list computed at REGISTRATION time by the
  // shared trainLocal and baked into static VALUES (the q_bpe_train
  // convention). q_wordpiece_encode runs the custom codegen expression
  // over real corpus words: probe rows carry exact segmentations
  // computed at registration by the independent local encoder
  // (including two [UNK]-collapse cases — an out-of-alphabet word and a
  // word whose first char only ever appears word-internally in the
  // corpus); every real row carries SQL-statable invariants (pieces
  // reassemble to the word or are exactly [UNK]; every piece is
  // in-vocab or the row is the [UNK] collapse; the first piece is never
  // a continuation), the q_unigram_encode reduced-form pattern.
  private val wpNumMerges = 10

  private def wpSymbolsLocal(w: String): IndexedSeq[String] =
    w.zipWithIndex.map { case (c, i) =>
      if (i == 0) c.toString else "##" + c }.toIndexedSeq

  private val wpLitEntries: Seq[(Long, IndexedSeq[String])] =
    bpeLitCorpus.map { case (w, n) => (n.toLong, wpSymbolsLocal(w)) }

  private val wpExpectedMerges: Seq[(String, String)] =
    graft.operators.WordPiece.trainLocal(wpLitEntries, wpNumMerges)

  private val wpVocab: Seq[String] =
    graft.operators.WordPiece.buildVocab(wpLitEntries, wpExpectedMerges)

  private val wordpieceTrain = GraftQuery(
    "q_wordpiece_train",
    (s, d) => {
      import s.implicits._
      val toks = bpeLitCorpus.flatMap { case (w, n) => Seq.fill(n)(w) }
      val docs = Seq((1L, toks)).toDF("doc_id", "toks")
      graft.operators.WordPiece.trainFast(docs, "toks", wpNumMerges)
        .zipWithIndex
        .map { case ((a, b), i) => (i + 1L, a, b) }
        .toDF("rank", "a", "b")
        .orderBy(asc("rank"))
    },
    Some(s"""SELECT * FROM (VALUES ${wpExpectedMerges.zipWithIndex
               .map { case ((a, b), i) =>
                 s"(CAST(${i + 1} AS BIGINT), '$a', '$b')" }
               .mkString(", ")}) AS t(rank, a, b) ORDER BY rank"""))

  // probe words: plain segmentations, plus "zzz" (z is out of the
  // corpus alphabet entirely) and "wow" (w occurs only word-internally
  // in "row", so there is no word-INITIAL "w" piece) — both must
  // collapse to [UNK] under the all-or-nothing BERT contract
  private val wpProbeWords = Seq(
    "scan", "scans", "rowhash", "cancan", "scatter", "zzz", "wow")
  private val wpProbeSegs: Seq[(Int, String, String)] =
    wpProbeWords.zipWithIndex.map { case (w, i) =>
      (i + 1, w, graft.operators.WordPiece
        .encodeLocal(w, wpVocab.toSet).mkString(" "))
    }

  private val wordpieceEncode = GraftQuery(
    "q_wordpiece_encode",
    (s, d) => {
      graft.plans.GraftFunctions.register(s)
      import s.implicits._
      val vocabLit = array(wpVocab.map(lit): _*)
      val unkArr = array(lit("[UNK]"))
      val real = documents(s, d)
        .filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("i", "word")))
        .filter(col("word").rlike("^[a-z]+$"))
        .select(col("doc_id"), (col("i") + 1).cast("long").as("word_pos"),
          col("word"))
        .withColumn("pieces", graft.functions.WordPieceEncode
          .wordpiece_encode(col("word"), wpVocab))
        .select(lit("real").as("kind"), col("doc_id"), col("word_pos"),
          col("word"), lit(null).cast("string").as("pieces_str"),
          (array_join(transform(col("pieces"),
            p => regexp_replace(p, "^##", "")), "") === col("word") ||
            col("pieces") === unkArr).as("concat_ok"),
          (size(filter(col("pieces"),
            p => !array_contains(vocabLit, p))) === 0 ||
            col("pieces") === unkArr).as("in_vocab_ok"),
          (!element_at(col("pieces"), 1).startsWith("##")).as("first_ok"))
      val probes = wpProbeSegs
        .toDF("word_pos_i", "word", "expected")
        .select(lit("probe").as("kind"), lit(-1L).as("doc_id"),
          col("word_pos_i").cast("long").as("word_pos"), col("word"))
        .withColumn("pieces_str",
          array_join(graft.functions.WordPieceEncode
            .wordpiece_encode(col("word"), wpVocab), " "))
        .withColumn("concat_ok", lit(true))
        .withColumn("in_vocab_ok", lit(true))
        .withColumn("first_ok", lit(true))
      real.unionByName(probes)
        .orderBy(asc("kind"), asc("doc_id"), asc("word_pos"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, $toksSql AS toks FROM documents
               WHERE doc_id % 20 = 0),
             w AS (
               SELECT doc_id, i AS word_pos, toks[i] AS word
               FROM t, unnest(generate_series(1, len(toks))) AS u(i)
               WHERE regexp_matches(toks[i], '^[a-z]+$$')),
             real AS (
               SELECT 'real' AS kind, doc_id,
                 CAST(word_pos AS BIGINT) AS word_pos, word,
                 CAST(NULL AS VARCHAR) AS pieces_str,
                 TRUE AS concat_ok, TRUE AS in_vocab_ok, TRUE AS first_ok
               FROM w),
             probes AS (
               SELECT 'probe' AS kind, CAST(-1 AS BIGINT) AS doc_id,
                 CAST(rn AS BIGINT) AS word_pos, word, seg AS pieces_str,
                 TRUE AS concat_ok, TRUE AS in_vocab_ok, TRUE AS first_ok
               FROM (VALUES ${wpProbeSegs.map { case (i, w, seg) =>
                 s"($i, '$w', '$seg')" }.mkString(", ")}) AS v(rn, word, seg))
             SELECT * FROM real UNION ALL SELECT * FROM probes
             ORDER BY kind, doc_id, word_pos"""))

  // ---- content-defined chunking (LBFS/rsync-family splitter) ---------
  // A chunk boundary opens wherever the 4-gram hash ≡ 0 (mod 64) —
  // edit-stable boundaries (an insertion moves only chunks up to the
  // next surviving boundary; suffix stability pinned in ChunkingSpec),
  // so chunk fingerprints dedup across near-identical docs where
  // fixed-stride chunks all shift. Oracle replays boundary selection,
  // chunk extents, and per-chunk md5 byte-for-byte.
  private val cdcChunks = GraftQuery(
    "q_cdc_chunks",
    (s, d) => {
      val t = documents(s, d).select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("toks"))
      graft.operators.Chunking.chunkContentDefined(t, "doc_id", "toks",
          k = 4, modulus = 64)
        .orderBy(asc("doc_id"), asc("chunk_id"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, $toksSql AS toks FROM documents
               WHERE len($toksSql) >= 1),
             st AS (
               SELECT doc_id, toks,
                 [1] || list_filter(generate_series(2, len(toks) - 3),
                   p -> ('0x' || substr(md5(array_to_string(
                     list_slice(toks, p, p + 3), ' ')), 1, 8))::BIGINT
                     % 64 = 0) AS starts
               FROM t),
             c AS (
               SELECT doc_id, toks, starts, j,
                 starts[j] AS start_pos,
                 CASE WHEN j < len(starts) THEN starts[j + 1] - 1
                      ELSE len(toks) END AS end_pos
               FROM st, unnest(generate_series(1, len(starts))) AS u(j))
             SELECT doc_id, CAST(j - 1 AS INT) AS chunk_id,
               CAST(start_pos AS INT) AS start_pos,
               CAST(end_pos - start_pos + 1 AS BIGINT) AS n_chunk_tokens,
               md5(array_to_string(list_slice(toks, start_pos, end_pos),
                 ' ')) AS chunk_fp
             FROM c ORDER BY doc_id, chunk_id"""))

  // ---- incremental pack maintenance ----------------------------------
  // Pack only the NEW half of the corpus (doc_id ≥ 250) as a
  // continuation of the already-packed base (doc_id < 250), carrying
  // only the base's total token count — the one scalar the previous
  // run's manifest persists. The oracle is a FULL RECOMPUTE over the
  // whole corpus restricted to the new ids (the q_incremental_agg
  // convention): identical pack assignments prove that immutable
  // shipped shards never need repacking when data appends.
  private val packIncrementalQ = GraftQuery(
    "q_pack_incremental",
    (s, d) => {
      val docs = documents(s, d)
      val prior = docs.filter(col("doc_id") < 250)
        .agg(coalesce(sum(size(TextFunctions.tokens(col("text")))
          .cast("long")), lit(0L))).head().getLong(0)
      graft.operators.Packing.packIncremental(
          docs.filter(col("doc_id") >= 250), prior, budget = 2000L)
        .orderBy(asc("doc_id"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, len($toksSql) AS n_tokens FROM documents),
             c AS (
               SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_excl
               FROM t)
             SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(cum_excl // 2000 AS BIGINT) AS pack_id
             FROM c WHERE doc_id >= 250 ORDER BY doc_id"""))

  // ---- per-pack shard manifest ---------------------------------------
  // The artifact a training pipeline ships WITH each pack: doc count,
  // token/char totals, id range, and an order-sensitive content digest
  // (md5 over the in-order per-doc text fingerprints) — the integrity
  // check a trainer fleet verifies before consuming a shard, and the
  // key incremental runs diff to skip unchanged packs. Composes
  // packByTokenBudget with one grouped aggregation; the digest makes
  // the gate sensitive to doc ORDER within the pack, not just
  // membership.
  private val packManifest = GraftQuery(
    "q_pack_manifest",
    (s, d) => {
      val docs = documents(s, d)
      val packs = graft.operators.Packing
        .packByTokenBudget(docs, budget = 2000L)
      packs.join(docs.select(col("doc_id"), md5(col("text")).as("doc_fp"),
          length(col("text")).cast("long").as("n_chars")), Seq("doc_id"))
        .groupBy("pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("pack_tokens"),
          sum(col("n_chars")).as("pack_chars"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("doc_fp")))),
            e => e.getField("doc_fp")), "")).as("content_digest"))
        .orderBy(asc("pack_id"))
    },
    Some(s"""WITH t AS (
               SELECT doc_id, len($toksSql) AS n_tokens, md5(text) AS doc_fp,
                 length(text) AS n_chars
               FROM documents),
             c AS (
               SELECT doc_id, n_tokens, doc_fp, n_chars,
                 COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_excl
               FROM t)
             SELECT CAST(cum_excl // 2000 AS BIGINT) AS pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS pack_chars,
               CAST(MIN(doc_id) AS BIGINT) AS first_doc,
               CAST(MAX(doc_id) AS BIGINT) AS last_doc,
               md5(string_agg(doc_fp, '' ORDER BY doc_id)) AS content_digest
             FROM c GROUP BY 1 ORDER BY 1"""))

  override val queries: Seq[GraftQuery] =
    Seq(repetition, repetitionSignals, urlCuration, scriptDetect,
        webPipeline, multimodalPipeline,
        decontaminate, decontaminateFuzzy, htmlPipeline, domainMix,
        trigramFreq, gopherFilter,
        crossSourceDup, trainSplit, dqChecks, weightedSample, tokenPacking,
        packSequences, packIncrementalQ, bpePairs, bpeTrain, bpeTokenize,
        bpeEncodeExpr, bpeStored, byteBpeEncode, unigramTrain, unigramPruned,
        unigramEncode,
        wordpieceTrain, wordpieceEncode,
        cdcChunks, packManifest)
}
