package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Ingest-time corpus curation as one streaming stage: tokenize once,
  * quality-gate, language-ID, exact-duplicate drop. This is the filter
  * a 100 TB pipeline wants at the point of arrival — documents that
  * fail the quality bar or repeat an already-seen fingerprint never
  * reach storage, so the expensive downstream passes (minhash, LM
  * scoring) see only survivors.
  *
  * Scale shape: every per-doc column is stateless (stays inside
  * whole-stage codegen per micro-batch); the only stateful operator is
  * the fingerprint `dropDuplicates`, whose state store is keyed by the
  * md5 — bounded by |distinct contents|, not arrival count. Production
  * streams with an event-time column bound that state with
  * `dropDuplicatesWithinWatermark`; the documents table carries no
  * timestamp, so the gate runs the unbounded form over one
  * availableNow batch (exact, all state live — the same trade as
  * `q_stream_dedup`).
  *
  * Works on a streaming OR batch frame — the gate runs it streaming
  * and oracles it against the batch SQL twin.
  */
object CurationStream {

  /** Curated survivor stream: `doc_id, fp, predicted, n_tokens,
    * quality` — one row per distinct fingerprint among docs meeting
    * `minQuality`. Which doc_id survives a duplicate group is
    * arrival-order-dependent; every OTHER column is text-derived and
    * therefore identical across the group (what makes the batch oracle
    * exact despite nondeterministic survivor choice).
    */
  def curate(docs: DataFrame, minQuality: Double = 0.35): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("fp", TextFunctions.exactFingerprintTokens(col("toks")))
      .withColumn("quality",
        TextFunctions.qualityScoreTokens(col("toks"), col("text")))
      .withColumn("predicted", TextFunctions.langId(col("text")))
      // quality is pure IEEE arithmetic in identical order on both
      // engines (no libm), so the raw-double threshold is deterministic
      .filter(col("quality") >= minQuality)
      .dropDuplicates("fp")
      .select(col("doc_id"), col("fp"), col("predicted"),
        size(col("toks")).cast("long").as("n_tokens"), col("quality"))
}
