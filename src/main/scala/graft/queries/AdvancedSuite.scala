package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.WktPoint
import graft.operators.Multimodal
import graft.plans.GraftFunctions
import graft.streaming.EventsStream

/** Extension-point surfaces through the correctness gate: the custom
  * codegen'd WktPoint expression, the Structured Streaming pipeline
  * (run with availableNow so its final table must equal the batch
  * oracle), and the multimodal feature plumbing.
  */
object AdvancedSuite extends QuerySuite {

  private val toksSql =
    """list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"""

  // ---- custom Catalyst expression, SQL-registered (SURVEY.md §7.4) ---
  private val wktPointExpr = GraftQuery(
    "q_wkt_point_expr",
    (s, d) => {
      GraftFunctions.register(s)
      val pts = customer(s, d).select(
        col("c_custkey"),
        concat(lit("POINT ("), col("c_nationkey").cast("string"), lit(" "),
               col("c_custkey").cast("string"), lit(")")).as("location"))
      pts.select(
          col("c_custkey"),
          WktPoint.wkt_point(col("location")).as("pt"))
        .select(
          col("c_custkey"),
          col("pt.latitude").as("latitude"),
          col("pt.longitude").as("longitude"))
        .orderBy(asc("c_custkey"))
        .limit(500)
    },
    Some("""WITH pts AS (
              SELECT c_custkey,
                'POINT (' || CAST(c_nationkey AS VARCHAR) || ' ' ||
                CAST(c_custkey AS VARCHAR) || ')' AS location
              FROM customer)
            SELECT c_custkey,
              CAST(NULLIF(regexp_extract(location,
                'POINT\s*\(\s*([-0-9.]+)\s+([-0-9.]+)\s*\)', 2), '')
                AS DOUBLE) AS latitude,
              CAST(NULLIF(regexp_extract(location,
                'POINT\s*\(\s*([-0-9.]+)\s+([-0-9.]+)\s*\)', 1), '')
                AS DOUBLE) AS longitude
            FROM pts ORDER BY c_custkey LIMIT 500"""))

  // ---- streaming pipeline vs batch oracle ----------------------------
  private val streamHourly = GraftQuery(
    "q_events_stream_hourly",
    (s, d) => {
      val streamed = EventsStream.hourlyCounts(EventsStream.readEvents(s, d))
      EventsStream.runToCompletion(s, streamed)
        .orderBy(asc("hour"), asc("event_type"))
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00')
                AS hour,
              event_type, COUNT(*) AS cnt,
              ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""))

  // ---- streaming sliding windows vs batch oracle ---------------------
  // 2-hour windows sliding hourly: every event lands in EXACTLY two
  // windows (the one starting at its floor-hour and the one an hour
  // earlier) — the oracle replays that membership by exploding each
  // event into its two window starts. The overlapping-window state is
  // what distinguishes this from q_events_stream_hourly's tumbling
  // windows; the real streaming plan runs through availableNow.
  private val streamSliding = GraftQuery(
    "q_stream_sliding",
    (s, d) => {
      val streamed = EventsStream.slidingCounts(EventsStream.readEvents(s, d))
      EventsStream.runToCompletion(s, streamed)
        .orderBy(asc("win_start"), asc("event_type"))
    },
    Some("""WITH w AS (
              SELECT strftime(date_trunc('hour', ts) - o * INTERVAL 1 HOUR,
                       '%Y-%m-%d %H:00:00') AS win_start,
                     event_type, value
              FROM events, unnest([0, 1]) AS u(o))
            SELECT win_start, event_type, COUNT(*) AS cnt,
              ROUND(SUM(value), 2) AS sum_value
            FROM w GROUP BY 1, 2 ORDER BY win_start, event_type"""))

  // ---- streaming dedup (dropDuplicatesWithinWatermark) vs batch ------
  // The stream is unioned with itself (every event arrives twice — the
  // at-least-once delivery the operator exists for); the deduped output
  // must reproduce the single-copy batch aggregates exactly. One
  // availableNow micro-batch keeps all dedup state live, so the check
  // is exact, not watermark-lossy.
  private val streamDedup = GraftQuery(
    "q_stream_dedup",
    (s, d) => {
      val ev = EventsStream.readEvents(s, d)
      val doubled = ev.unionByName(EventsStream.readEvents(s, d))
      val deduped = EventsStream.dedupedEvents(doubled)
      EventsStream.runToCompletion(s, deduped, outputMode = "append")
        .agg(count(lit(1)).as("n_rows"),
             countDistinct(col("event_id")).as("n_ids"),
             round(sum(col("value")), 2).as("sum_value"))
    },
    Some("""SELECT COUNT(*) AS n_rows, COUNT(DISTINCT event_id) AS n_ids,
              ROUND(SUM(value), 2) AS sum_value
            FROM events"""))

  // ---- custom streaming state (flatMapGroupsWithState) vs batch ------
  // Update-mode emissions accumulate in the sink; the final per-user
  // total is the row with the max (monotone) event count. State carries
  // raw sums so the result is micro-batch-boundary-invariant, which is
  // exactly what lets a batch SQL oracle check a stateful stream.
  private val statefulTotals = GraftQuery(
    "q_stateful_totals",
    (s, d) => {
      import s.implicits._
      val ev = EventsStream.readEvents(s, d)
        .select(col("user_id"), col("value"))
        .as[graft.streaming.StatefulCounter.UserEventIn]
      val emitted = EventsStream.runToCompletion(
        s, graft.streaming.StatefulCounter.runningTotals(s, ev).toDF(),
        outputMode = "update")
      emitted.groupBy("user_id")
        .agg(max(col("n_events")).as("n_events"),
             max_by(col("total_value"), col("n_events")).as("total_value"))
        .orderBy(asc("user_id"))
    },
    Some("""SELECT user_id, COUNT(*) AS n_events,
              ROUND(SUM(value), 2) AS total_value
            FROM events GROUP BY user_id ORDER BY user_id"""))

  // ---- streaming MinHash-LSH near-dup vs the COUNT oracle ------------
  // The ingest-time near-dup stream (NearDupStream): per-doc signatures
  // stateless, one flatMapGroupsWithState keyed by (band, bucket), pairs
  // emitted at arrival. Run through availableNow over the planted
  // corpus (documents ∪ documents+1e6 — every text exactly twice), then
  // the SAME exact-fingerprint COUNT restriction as q_dedup_minhash:
  // identical texts have identical signatures ⇒ co-bucket in EVERY band
  // ⇒ guaranteed candidates with est = 1, so streamed pairs restricted
  // to fp-equal must equal Σ C(k,2) over eligible contents (k ≤ cap,
  // ≥ 1 token), and zero buckets may overflow on this corpus — all
  // SQL-decidable. maxBucket is set far above any plausible bucket size
  // (bucket arrivals count ALL co-bucketed docs, which different texts
  // sharing a band hash can inflate past any per-CONTENT count — a cap
  // near the per-content cap would make n_overflow=0 corpus-dependent;
  // ADVICE r11). The cross-batch-state and split-invariance behavior
  // is spec-pinned (NearDupStreamSpec); this gate drives the REAL
  // streaming plan through the driver's oracle harness.
  private val streamNearDup = GraftQuery(
    "q_stream_neardup",
    (s, d) => {
      val st = EventsStream.readTable(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val plantedStream = st.unionByName(
        st.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val hits = graft.streaming.NearDupStream.candidatePairs(
        graft.streaming.NearDupStream.bandedSignatures(plantedStream),
        maxBucket = 1000000)
      val emitted = EventsStream.runToCompletion(s, hits.toDF(),
        outputMode = "append")
      val pairs = graft.streaming.NearDupStream.distinctPairs(emitted)
      val docs = documents(s, d).select(col("doc_id"), col("text"))
      val p = docs.unionByName(
        docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val fps = p.select(col("doc_id"),
        graft.functions.TextFunctions.exactFingerprint(col("text")).as("fp"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("ntok"))
      val eligible = fps.groupBy("fp")
        .agg(count(lit(1)).as("k"), min(col("ntok")).as("mintok"))
        .filter(col("k") <= 1000000 && col("mintok") >= 1)
        .select(col("fp"))
      val exactPairs = pairs
        .join(fps.select(col("doc_id").as("a"), col("fp").as("fa")), "a")
        .join(fps.select(col("doc_id").as("b"), col("fp").as("fb")), "b")
        .filter(col("fa") === col("fb"))
        .join(eligible.select(col("fp").as("fa")), "fa")
        .agg(count(lit(1)).as("n_exact_pairs"),
             (min(col("est")) === 1.0).as("exact_est_ok"))
      val overflow = graft.streaming.NearDupStream.overflowedBuckets(emitted)
        .agg(count(lit(1)).as("n_overflow"))
      // two one-row aggregates — the broadcast-scalar crossJoin shape
      exactPairs.crossJoin(overflow)
    },
    Some(s"""WITH corpus AS (
               SELECT doc_id, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000, text FROM documents),
             per_content AS (
               SELECT md5(array_to_string($toksSql, ' ')) AS h, COUNT(*) AS k,
                      MIN(len($toksSql)) AS mintok
               FROM corpus GROUP BY h)
             SELECT CAST(SUM(k * (k - 1) / 2) AS BIGINT) AS n_exact_pairs,
                    TRUE AS exact_est_ok, CAST(0 AS BIGINT) AS n_overflow
             FROM per_content WHERE k <= 1000000 AND mintok >= 1"""))

  // ---- streaming incremental packing vs the batch-recompute oracle ---
  // The ingest-time continuation of q_pack_incremental: the docs with
  // id >= 250 arrive as a stream and extend the packed prefix's
  // assignments (priorTokens/maxPackedId seeded from the id < 250
  // slice), through the REAL streaming plan — stateless token counting,
  // then ONE flatMapGroupsWithState whose state is two longs. The
  // oracle is the identical full-corpus prefix-sum recompute restricted
  // to the streamed slice, plus n_violations = 0 (the parquet source
  // feeds ids in contract order; the violation path is spec-pinned in
  // PackStreamSpec where order can be broken deliberately).
  private val streamPack = GraftQuery(
    "q_stream_pack",
    (s, d) => {
      val prior = documents(s, d).filter(col("doc_id") < 250)
        .agg(coalesce(sum(size(graft.functions.TextFunctions
          .tokens(col("text"))).cast("long")), lit(0L))).head().getLong(0)
      val st = EventsStream.readTable(s, d, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") >= 250)
      val hits = graft.streaming.PackStream.assignPacks(
        graft.streaming.PackStream.tokenCounts(st), budget = 2000L,
        priorTokens = prior, maxPackedId = 249L)
      val emitted = EventsStream.runToCompletion(s, hits.toDF(),
        outputMode = "append")
      val packs = graft.streaming.PackStream.packedDocs(emitted)
        .select(col("id").as("doc_id"), col("n_tokens"), col("pack_id"))
      val nviol = graft.streaming.PackStream.violations(emitted)
        .agg(count(lit(1)).as("n_violations"))
      packs.crossJoin(broadcast(nviol)).orderBy(asc("doc_id"))
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
               CAST(cum_excl // 2000 AS BIGINT) AS pack_id,
               CAST(0 AS BIGINT) AS n_violations
             FROM c WHERE doc_id >= 250 ORDER BY doc_id"""))

  // ---- streaming quality classification under a trained model --------
  // The deploy shape of q_linear_classify: train the hashed-bigram
  // logistic model on the BATCH table, ship the weight vector as a
  // plan literal, and score the document STREAM with the stateless
  // in-row expression (LinearClassifier.scoreColumns — zero joins, zero
  // aggregations, zero state before the sink; append-mode legal by
  // construction). The in-row fold is bit-identical to the batch
  // scoring pass (spec-pinned), so the oracle is the SAME training+
  // scoring replay q_linear_classify uses.
  private val streamClassify = GraftQuery(
    "q_stream_classify",
    (s, d) => {
      def plant(df: org.apache.spark.sql.DataFrame) = df.select(
        col("doc_id"), (col("doc_id") % 2).cast("int").as("y"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0, lit(" mk0 mk0"))
            .otherwise(lit(" mk1 mk1"))).as("text"))
      val train = plant(documents(s, d))
        .select(col("doc_id"), col("y"),
          graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 1)
      val (w, _) = graft.operators.LinearClassifier.train(
        train, "doc_id", "toks", "y", numBuckets = 2048, iters = 2,
        lr = 5.0)
      val (arr, intercept) =
        graft.operators.LinearClassifier.collectWeights(w, 2048)
      val st = plant(EventsStream.readTable(s, d, "documents"))
        .select(col("doc_id"), col("y"),
          graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 1)
      val (nf, score, pred) = graft.operators.LinearClassifier
        .scoreColumns(col("toks"), arr, intercept)
      val scored = st.select(col("doc_id"), col("y"),
        nf.as("n_features"), score.as("score"), pred.as("pred_label"))
      EventsStream.runToCompletion(s, scored, outputMode = "append")
        .orderBy(asc("doc_id"))
    },
    Some(CurationExtSuite.linearClassifyOracleSql))

  // ---- multi-stage streaming ingest (curate → boundary → pack) -------
  // Production streaming pipelines chain ONE stateful operator per
  // query, with durable storage as the stage boundary — that composed
  // shape, end-to-end: stage 1 scores the document stream under the
  // batch-trained model (stateless in-row scoring) and keeps
  // predicted-quality docs; its emitted rows land in parquet (the
  // boundary, written single-file so stage 2's id-order contract holds
  // deterministically); stage 2 streams the boundary through PackStream
  // (the two-long stateful packer); the final manifest aggregates the
  // packed output. The oracle replays everything — training, scoring,
  // the keep-filter, the prefix-sum packing, the manifest — from the
  // shared classify CTEs.
  private val streamIngest = GraftQuery(
    "q_stream_ingest",
    (s, d) => {
      def plant(df: org.apache.spark.sql.DataFrame) = df.select(
        col("doc_id"), (col("doc_id") % 2).cast("int").as("y"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0, lit(" mk0 mk0"))
            .otherwise(lit(" mk1 mk1"))).as("text"))
      val train = plant(documents(s, d))
        .select(col("doc_id"), col("y"),
          graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 1)
      val (w, _) = graft.operators.LinearClassifier.train(
        train, "doc_id", "toks", "y", numBuckets = 2048, iters = 2,
        lr = 5.0)
      val (arr, intercept) =
        graft.operators.LinearClassifier.collectWeights(w, 2048)
      // stage 1: stateless classify-filter over the stream
      val st1 = plant(EventsStream.readTable(s, d, "documents"))
        .select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 1)
      val (_, score, pred) = graft.operators.LinearClassifier
        .scoreColumns(col("toks"), arr, intercept)
      val kept = st1
        .select(col("doc_id"), size(col("toks")).cast("long")
          .as("n_tokens"), score.as("score"), pred.as("pred_label"))
        .filter(col("pred_label") === 1)
        .select(col("doc_id"), col("n_tokens"))
      val boundary = s"${GateStates.dir}" +
        s"/ingest_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      EventsStream.runToCompletion(s, kept, outputMode = "append")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$boundary/kept.parquet")
      // stage 2: stateful packing over the boundary stream
      val st2 = EventsStream.readTable(s, boundary, "kept")
      val packed = graft.streaming.PackStream.assignPacks(
        st2.select(col("doc_id").as("id"), col("n_tokens"))
          .as[graft.streaming.PackStream.DocTokens](
            org.apache.spark.sql.Encoders.product[
              graft.streaming.PackStream.DocTokens]),
        budget = 2000L)
      val emitted = EventsStream.runToCompletion(s, packed.toDF(),
        outputMode = "append")
      // final manifest (batch over the packed output)
      graft.streaming.PackStream.packedDocs(emitted)
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("pack_tokens"),
          min(col("id")).as("min_doc"), max(col("id")).as("max_doc"))
        .orderBy(asc("pack_id"))
    },
    Some(s"""${CurationExtSuite.linearClassifyCtes},
             kept AS (
               SELECT s.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens
               FROM scored s JOIN t USING (doc_id)
               WHERE s.score > 0),
             c AS (
               SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_excl
               FROM kept),
             packs AS (
               SELECT doc_id, n_tokens,
                 CAST(cum_excl // 2000 AS BIGINT) AS pack_id
               FROM c)
             SELECT pack_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
             FROM packs GROUP BY pack_id ORDER BY pack_id"""))

  // ---- multimodal plumbing -------------------------------------------
  private val multimodal = GraftQuery(
    "q_multimodal_features",
    (s, d) => {
      val media = Multimodal.synthesizeMedia(documents(s, d))
      Multimodal.extractFeatures(s, media)
        .toDF()
        .select(
          col("doc_id"), col("media_type"), col("n_bytes"),
          size(col("features")).as("feat_dim"))
        .orderBy(asc("doc_id"))
    },
    Some("""SELECT doc_id,
              CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
              END AS media_type,
              CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
              8 AS feat_dim
            FROM documents ORDER BY doc_id"""))

  // ---- multimodal frame sampling -------------------------------------
  // Videos explode to nFrames payload slices in one distributed pass
  // (posexplode); the oracle checks the SHAPE contract arithmetically —
  // per-frame byte counts are a pure function of payload length, so the
  // stubbed codec's plumbing (slice positions, lengths, pass-through of
  // non-video rows) is what's actually being verified.
  private val frameSample = GraftQuery(
    "q_frame_sample",
    (s, d) =>
      Multimodal.sampleFrames(Multimodal.synthesizeMedia(documents(s, d)), 4)
        .select(col("doc_id"), col("media_type"), col("frame_no"),
                octet_length(col("content")).as("frame_bytes"))
        .orderBy(asc("doc_id"), asc("frame_no")),
    Some("""WITH m AS (
              SELECT doc_id,
                CASE CAST(doc_id % 3 AS INTEGER)
                  WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
                END AS media_type,
                octet_length(encode(text)) AS len
              FROM documents),
            v AS (
              SELECT doc_id, media_type, len,
                greatest(1, len // 4) AS fs
              FROM m WHERE media_type = 'video'),
            frames AS (
              SELECT doc_id, media_type, unnest(generate_series(0, 3)) AS f,
                fs, len FROM v),
            video_rows AS (
              SELECT doc_id, media_type, CAST(f AS INTEGER) AS frame_no,
                CAST(LEAST(fs, len - f * fs) AS INTEGER) AS frame_bytes
              FROM frames),
            other_rows AS (
              SELECT doc_id, media_type, 0 AS frame_no,
                CAST(len AS INTEGER) AS frame_bytes
              FROM m WHERE media_type <> 'video')
            SELECT * FROM video_rows
            UNION ALL SELECT * FROM other_rows
            ORDER BY doc_id, frame_no"""))

  // ---- REAL image decode vs an independent encoder -------------------
  // The fixture PNGs are written by a python-STDLIB encoder
  // (tools/make_image_fixtures.py — struct+zlib, no shared code with
  // the JVM) with ground-truth stats computed from the raw pattern
  // arrays; javax.imageio must decode every file to the same
  // dimensions, channel count, and exact per-channel pixel sums. Covers
  // gray / RGB / RGBA, 1x1 through 255-wide, filter-0 scanlines.
  private val imageDir = "/root/repo/src/test/resources/fixtures/images"
  private val imageDecode = GraftQuery(
    "q_image_decode",
    (s, _) =>
      Multimodal.imageFeatures(s, s"$imageDir/*.png")
        .toDF()
        .orderBy(asc("file_name")),
    Some(s"""SELECT file_name,
               CAST(width AS INTEGER) AS width,
               CAST(height AS INTEGER) AS height,
               CAST(channels AS INTEGER) AS channels,
               CAST(n_px AS BIGINT) AS n_px,
               CAST(sum_r AS BIGINT) AS sum_r,
               CAST(sum_g AS BIGINT) AS sum_g,
               CAST(sum_b AS BIGINT) AS sum_b
             FROM read_csv('$imageDir/images.csv', header=true)
             ORDER BY file_name"""))

  // ---- in-pipeline image round-trip (encode → decode, SQL oracle) ----
  // One two-tone PNG per document, every dimension and color an integer
  // function of doc_id — so DuckDB reproduces the decode stats with
  // pure arithmetic, never seeing a pixel. Pins BOTH codec directions
  // plus the distributed plumbing (binary payloads through
  // mapPartitions, stats out as columns).
  private val imageFeaturesQ = GraftQuery(
    "q_image_features",
    (s, d) =>
      Multimodal.imageFeaturesById(
          s, Multimodal.synthesizeImages(s, documents(s, d)))
        .toDF()
        .orderBy(asc("doc_id")),
    Some("""WITH m AS (
              SELECT doc_id,
                CAST((doc_id % 16) * 4 + 8 AS INTEGER) AS w,
                CAST((doc_id % 12) * 4 + 8 AS INTEGER) AS h,
                CAST((doc_id * 13) % 256 AS INTEGER) AS ra,
                CAST((doc_id * 7 + 31) % 256 AS INTEGER) AS ga,
                CAST((doc_id * 29 + 17) % 256 AS INTEGER) AS ba
              FROM documents)
            SELECT doc_id, w AS width, h AS height,
              CAST(3 AS INTEGER) AS channels,
              CAST(w AS BIGINT) * h AS n_px,
              CAST(h AS BIGINT) * ((w // 2) * ra + (w - w // 2) * (255 - ra))
                AS sum_r,
              CAST(h AS BIGINT) * ((w // 2) * ga + (w - w // 2) * (255 - ga))
                AS sum_g,
              CAST(h AS BIGINT) * ((w // 2) * ba + (w - w // 2) * (255 - ba))
                AS sum_b
            FROM m ORDER BY doc_id"""))

  // ---- REAL audio decode vs an independent encoder -------------------
  // WAV fixtures from the python-stdlib `wave` writer
  // (tools/make_audio_fixtures.py) with sums computed from the raw
  // sample arrays; javax.sound.sampled must decode every file to the
  // same metadata and exact per-channel signed-sample sums. Covers
  // mono/stereo, 16-bit and 8-bit (center-shifted), 1-frame edge.
  private val audioDir = "/root/repo/src/test/resources/fixtures/audio"
  private val audioDecode = GraftQuery(
    "q_audio_decode",
    (s, _) =>
      Multimodal.audioFeatures(s, s"$audioDir/*.{wav,aiff}")
        .toDF()
        .orderBy(asc("file_name")),
    Some(s"""SELECT file_name,
               CAST(sample_rate AS INTEGER) AS sample_rate,
               CAST(channels AS INTEGER) AS channels,
               CAST(bits AS INTEGER) AS bits,
               CAST(n_frames AS BIGINT) AS n_frames,
               CAST(sum_l AS BIGINT) AS sum_l,
               CAST(sum_r AS BIGINT) AS sum_r
             FROM read_csv('$audioDir/audio.csv', header=true)
             ORDER BY file_name"""))

  // ---- in-pipeline audio round-trip (encode → decode, SQL oracle) ----
  // Two-segment mono PCM-16 clip per document, frame count and both
  // amplitudes integer functions of doc_id — the audio twin of
  // q_image_features.
  private val audioFeaturesQ = GraftQuery(
    "q_audio_features",
    (s, d) =>
      Multimodal.audioFeaturesById(
          s, Multimodal.synthesizeAudio(s, documents(s, d)))
        .toDF()
        .orderBy(asc("doc_id")),
    Some("""WITH m AS (
              SELECT doc_id,
                CAST((doc_id % 50) * 4 + 40 AS INTEGER) AS n,
                CAST((doc_id * 131) % 60000 - 30000 AS BIGINT) AS a,
                CAST((doc_id * 257 + 12345) % 60000 - 30000 AS BIGINT) AS b
              FROM documents)
            SELECT doc_id,
              CAST(8000 AS INTEGER) AS sample_rate,
              CAST(1 AS INTEGER) AS channels,
              CAST(16 AS INTEGER) AS bits,
              CAST(n AS BIGINT) AS n_frames,
              (n // 2) * a + (n - n // 2) * b AS sum_l,
              (n // 2) * a + (n - n // 2) * b AS sum_r
            FROM m ORDER BY doc_id"""))

  // ---- REAL video container probe vs an independent encoder ----------
  // Box/chunk trees hand-assembled by the python-stdlib writer
  // (tools/make_video_fixtures.py, struct only): ftyp brands, v0 mvhd
  // timescale/duration, multi-track moov, 16.16 tkhd dims, a free box
  // to skip — plus RIFF/AVI avih headers (brand "AVI ", µs-per-frame
  // clock, total frames, stream count) with a JUNK chunk to skip. The
  // metadata pass every video pipeline runs before deciding what to
  // decode; frame decode itself is q_video_frames.
  private val videoDir = "/root/repo/src/test/resources/fixtures/video"
  private val videoProbe = GraftQuery(
    "q_video_probe",
    (s, _) =>
      Multimodal.videoMeta(s, s"$videoDir/*.{mp4,avi}")
        .toDF()
        .orderBy(asc("file_name")),
    Some(s"""SELECT file_name, brand,
               CAST(timescale AS BIGINT) AS timescale,
               CAST(duration AS BIGINT) AS duration,
               CAST(n_tracks AS INTEGER) AS n_tracks,
               CAST(width AS INTEGER) AS width,
               CAST(height AS INTEGER) AS height
             FROM read_csv('$videoDir/video.csv', header=true)
             ORDER BY file_name"""))

  // ---- REAL video frame decode vs an independent encoder -------------
  // Motion-JPEG streams (raw, MJPEG-in-MP4, and MJPEG-in-AVI)
  // hand-encoded by the python-stdlib writer
  // (tools/make_video_frame_fixtures.py, struct only — baseline JPEG
  // with all-ones quant tables, flat-gray frames whose DC-only blocks
  // round-trip EXACTLY); ImageIO must decode every frame to the same
  // dims and exact pixel sums. Covers raw streams, plain/largesize/
  // to-EOF mdat encodings, AVI movi chunks (plain and OpenDML
  // rec-grouped with interleaved audio chunks + odd-size RIFF padding),
  // odd dims, a 12-frame stream, a junk file (dropped) and a truncated
  // tail (good frames kept).
  private val vframesDir = "/root/repo/src/test/resources/fixtures/video_frames"
  private val videoFramesQ = GraftQuery(
    "q_video_frames",
    (s, _) =>
      Multimodal.videoFrames(s, s"$vframesDir/*.{mjpeg,mp4,avi}")
        .toDF()
        .orderBy(asc("file_name"), asc("frame_no")),
    Some(s"""SELECT file_name,
               CAST(frame_no AS INTEGER) AS frame_no,
               CAST(width AS INTEGER) AS width,
               CAST(height AS INTEGER) AS height,
               CAST(channels AS INTEGER) AS channels,
               CAST(n_px AS BIGINT) AS n_px,
               CAST(sum_r AS BIGINT) AS sum_r,
               CAST(sum_g AS BIGINT) AS sum_g,
               CAST(sum_b AS BIGINT) AS sum_b
             FROM read_csv('$vframesDir/frames.csv', header=true)
             ORDER BY file_name, frame_no"""))

  // ---- in-pipeline video round-trip (encode → decode, SQL oracle) ----
  // One raw MJPEG stream per document — frame count, dims, and each
  // frame's flat gray value integer functions of doc_id, every frame a
  // REAL ImageIO JPEG encode at quality 1.0 (all-ones quant tables ⇒
  // flat blocks round-trip exactly) — the video twin of
  // q_image_features: both codec directions plus the frame-split walk,
  // checked by pure SQL arithmetic.
  private val videoFeaturesQ = GraftQuery(
    "q_video_features",
    (s, d) =>
      Multimodal.videoFramesById(
          s, Multimodal.synthesizeVideos(s, documents(s, d)))
        .toDF()
        .orderBy(asc("doc_id"), asc("frame_no")),
    Some("""WITH m AS (
              SELECT doc_id,
                CAST((doc_id % 10) * 4 + 12 AS INTEGER) AS w,
                CAST((doc_id % 7) * 4 + 12 AS INTEGER) AS h,
                CAST(doc_id % 5 + 2 AS INTEGER) AS nf
              FROM documents),
            f AS (
              SELECT doc_id, w, h,
                CAST(unnest(generate_series(0, nf - 1)) AS INTEGER)
                  AS frame_no
              FROM m)
            SELECT doc_id, frame_no, w AS width, h AS height,
              CAST(1 AS INTEGER) AS channels,
              CAST(w AS BIGINT) * h AS n_px,
              CAST(w AS BIGINT) * h * ((doc_id * 37 + frame_no * 11) % 256)
                AS sum_r,
              CAST(w AS BIGINT) * h * ((doc_id * 37 + frame_no * 11) % 256)
                AS sum_g,
              CAST(w AS BIGINT) * h * ((doc_id * 37 + frame_no * 11) % 256)
                AS sum_b
            FROM f ORDER BY doc_id, frame_no"""))

  // ---- composed multimodal curation (decode in the loop) -------------
  // The end-to-end shape a training-data pipeline runs: per-doc image
  // and audio payloads REALLY encode and decode (ImageIO +
  // javax.sound.sampled), decoded stats join the text-side token count,
  // and a quality filter selects the kept set. Every number is an
  // integer function of doc_id, so the whole composed pipeline —
  // two codecs, two joins, filter, aggregate — checks against pure SQL
  // arithmetic.
  private val multimodalCuration = GraftQuery(
    "q_multimodal_curation",
    (s, d) => {
      val docs = documents(s, d)
      val imgF = Multimodal.imageFeaturesById(
        s, Multimodal.synthesizeImages(s, docs)).toDF()
        .select(col("doc_id"), col("width"), col("n_px"))
      val audF = Multimodal.audioFeaturesById(
        s, Multimodal.synthesizeAudio(s, docs)).toDF()
        .select(col("doc_id"), col("n_frames"))
      val toks = docs.select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n_tokens"))
      imgF.join(audF, "doc_id").join(toks, "doc_id")
        .filter(col("width") >= 32 && col("n_frames") >= 120 &&
                col("n_tokens") >= 30)
        .agg(count(lit(1)).as("n_kept"),
             sum(col("n_px")).as("total_px"),
             sum(col("n_frames")).as("total_frames"))
    },
    Some("""WITH m AS (
              SELECT doc_id,
                (doc_id % 16) * 4 + 8 AS w,
                (doc_id % 12) * 4 + 8 AS h,
                (doc_id % 50) * 4 + 40 AS n,
                len(list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x <> '')) AS n_tokens
              FROM documents)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(w * h) AS BIGINT) AS total_px,
                   CAST(SUM(n) AS BIGINT) AS total_frames
            FROM m WHERE w >= 32 AND n >= 120 AND n_tokens >= 30"""))

  // ---- stream-stream interval join vs batch oracle -------------------
  private val streamStreamJoin = GraftQuery(
    "q_stream_stream_join",
    (s, d) =>
      EventsStream.runToCompletion(
        s, EventsStream.purchaseClickJoin(s, d), outputMode = "append")
        .orderBy(asc("user_id"), asc("purchase_id"), asc("c_ts")),
    Some("""SELECT p.user_id, p.event_id AS purchase_id,
              strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS p_ts,
              p.value AS purchase_value,
              strftime(CAST(c.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS c_ts,
              c.value AS click_value
            FROM events p
            JOIN events c
              ON p.user_id = c.user_id
             AND p.event_type = 'purchase' AND c.event_type = 'click'
             AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
            ORDER BY p.user_id, purchase_id, c_ts"""))

  // ---- stream-static dimension join vs batch oracle ------------------
  private val streamStaticJoin = GraftQuery(
    "q_stream_static_join",
    (s, d) =>
      EventsStream.runToCompletion(
        s, EventsStream.segmentDailyCounts(s, d))
        .orderBy(asc("day"), asc("segment")),
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
              c_mktsegment AS segment, COUNT(*) AS cnt,
              ROUND(SUM(value), 2) AS sum_value
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY day, segment ORDER BY day, segment"""))

  // ---- streaming sketch maintenance (stream in, merge forever) -------
  // Per-source distinct-document tracking through the REAL streaming
  // plan: each micro-batch folds into a per-key theta sketch carried in
  // the STATE STORE as its serialized compact image; the latest states
  // land in a SketchStats.saveStates table and the gate answers ONLY
  // from the written-then-loaded states (the q_theta_stored
  // convention). Distinct fingerprints per source ≪ nominalEntries ⇒
  // exact mode ⇒ full value equality against COUNT(DISTINCT).
  private val streamSketch = GraftQuery(
    "q_stream_sketch",
    (s, d) => {
      import s.implicits._
      val st = EventsStream.readTable(s, d, "documents")
        .select(col("source"), md5(col("text")).as("fp"))
      val collected = EventsStream.runToCompletion(s,
        graft.streaming.SketchStream.thetaByKey(st, "source", "fp").toDF(),
        outputMode = "append")
      val path = s"${GateStates.dir}/" +
        s"stream_theta_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.operators.SketchStats.saveStates(
        graft.streaming.SketchStream.latestStates(collected)
          .withColumnRenamed("key", "source"), path)
      graft.operators.SketchStats.loadStates(s, path).collect()
        .map(r => (r.getString(0), math.round(
          graft.operators.SketchStats.thetaEstimate(
            r.getAs[Array[Byte]](1)))))
        .toSeq.toDF("source", "n_distinct")
        .orderBy(asc("source"))
    },
    Some("""SELECT source, CAST(COUNT(DISTINCT text) AS BIGINT)
              AS n_distinct
            FROM documents GROUP BY source ORDER BY source"""))

  // ---- streaming KLL maintenance (quantile twin of q_stream_sketch) --
  // Per-source token-count DISTRIBUTION state through the real
  // streaming plan; latest states land in the stored-states table and
  // the gate answers only from the written-then-loaded states. Exact
  // mode (per-source n ≪ k) ⇒ INCLUSIVE getQuantile == percentile_disc.
  private val streamKll = GraftQuery(
    "q_stream_kll",
    (s, d) => {
      import s.implicits._
      val st = EventsStream.readTable(s, d, "documents")
        .select(col("source"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("double").as("n_toks"))
      val collected = EventsStream.runToCompletion(s,
        graft.streaming.SketchStream.kllByKey(st, "source", "n_toks",
          k = 16384).toDF(),
        outputMode = "append")
      val path = s"${GateStates.dir}/" +
        s"stream_kll_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.operators.SketchStats.saveStates(
        graft.streaming.SketchStream.latestStates(collected, "kll")
          .withColumnRenamed("key", "source"), path)
      val ranks = Seq(0.25, 0.5, 0.75, 0.9)
      graft.operators.SketchStats.loadStates(s, path).collect().toSeq
        .map { r =>
          val qs = graft.operators.SketchStats
            .kllQuantiles(r.getAs[Array[Byte]]("kll"), ranks)
          (r.getString(0), qs(0).toLong, qs(1).toLong, qs(2).toLong,
            qs(3).toLong)
        }
        .toDF("source", "p25", "p50", "p75", "p90")
        .orderBy(asc("source"))
    },
    Some(s"""WITH t AS (
               SELECT source, len($toksSql) AS n FROM documents)
             SELECT source,
               CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n)
                 AS BIGINT) AS p25,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n)
                 AS BIGINT) AS p50,
               CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY n)
                 AS BIGINT) AS p75,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n)
                 AS BIGINT) AS p90
             FROM t GROUP BY source ORDER BY source"""))

  // ---- streaming CMS maintenance (point-frequency trio member) -------
  // Per-source token-frequency state through the real streaming plan;
  // answers come ONLY from the written-then-loaded states. The probe
  // estimates are deterministic (fixed seed) and collision-free in
  // practice at this geometry (31-token vocab vs ~2000 cells × 7 rows,
  // min-of-rows ⇒ overcount odds ~1e-13), so COUNT(*) value equality
  // holds — and is pinned at three SFs, the q_cms_heavy_hitters
  // convention.
  private val streamCms = GraftQuery(
    "q_stream_cms",
    (s, d) => {
      import s.implicits._
      val st = EventsStream.readTable(s, d, "documents")
        .select(col("source"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("tok"))
      val collected = EventsStream.runToCompletion(s,
        graft.streaming.SketchStream.cmsByKey(st, "source", "tok").toDF(),
        outputMode = "append")
      val path = s"${GateStates.dir}/" +
        s"stream_cms_${d.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.operators.SketchStats.saveStates(
        graft.streaming.SketchStream.latestStates(collected, "cms")
          .withColumnRenamed("key", "source"), path)
      val probes = Seq("join", "hash", "scan")
      graft.operators.SketchStats.loadStates(s, path).collect().toSeq
        .flatMap { r =>
          val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("cms")))
          probes.map(p => (r.getString(0), p, cms.estimateCount(p)))
        }
        .toDF("source", "tok", "freq")
        // a probe absent from a source emits freq 0 here but no GROUP
        // BY row in SQL — align the shapes (all three probes occur in
        // every source at every SF; this is shape hygiene, not masking)
        .filter(col("freq") > 0)
        .orderBy(asc("source"), asc("tok"))
    },
    Some(s"""WITH inst AS (
               SELECT source, unnest($toksSql) AS tok FROM documents)
             SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS freq
             FROM inst WHERE tok IN ('join', 'hash', 'scan')
             GROUP BY source, tok ORDER BY source, tok"""))

  override val queries: Seq[GraftQuery] =
    Seq(wktPointExpr, streamHourly, streamSliding, streamDedup, multimodal,
        frameSample,
        imageDecode, imageFeaturesQ, audioDecode, audioFeaturesQ,
        videoProbe, videoFramesQ, videoFeaturesQ, multimodalCuration,
        streamStreamJoin, streamStaticJoin, statefulTotals, streamNearDup,
        streamPack, streamClassify, streamIngest, streamSketch, streamKll,
        streamCms)
}
