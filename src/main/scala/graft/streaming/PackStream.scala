package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions

/** STREAMING incremental token-budget packing: arriving documents
  * extend an already-packed corpus' pack assignments at ingest time —
  * the streaming rendition of [[graft.operators.Packing.packIncremental]]
  * (yesterday's shards are immutable and shipped; today's crawl appends
  * as it lands, not in a nightly repack).
  *
  * Scale shape: everything heavy is stateless and per-row BEFORE the
  * stateful operator — tokenization and token counting distribute over
  * the stream's input partitions ([[tokenCounts]]). The stateful core
  * is one `flatMapGroupsWithState` on a SINGLE key whose state is two
  * longs (running token total, max assigned id) and whose per-doc work
  * is one add and one compare. That single key is an honest
  * serialization point, and an inherent one: pack continuation is a
  * sequential prefix sum over ingest order — the batch operator
  * parallelizes it two-pass because it sees the whole corpus at once; a
  * stream, by definition, does not. The state is O(1) regardless of
  * corpus size (contrast [[NearDupStream]]'s per-bucket member lists).
  *
  * Determinism contract (the [[graft.operators.Packing.packIncremental]]
  * continuation contract, rendered streaming): docs are id-sorted
  * within each micro-batch, and the state carries the max assigned id —
  * provided ids arrive in nondecreasing-batch order (every id in batch
  * N+1 sorts after every id in batch N), the assignment equals the
  * batch `packByTokenBudget` over prior ∪ stream, INDEPENDENT of
  * micro-batch boundaries (spec-pinned). A doc that violates the order
  * emits a loud `kind = "violation"` marker row with pack_id −1 and
  * does NOT advance the totals — consumers exclude it and repack from
  * the batch path, the [[NearDupStream]] overflow convention.
  */
object PackStream {

  final case class DocTokens(id: Long, n_tokens: Long)

  /** `kind` is "pack" (a real assignment) or "violation" (out-of-order
    * id; pack_id = −1, totals untouched).
    */
  final case class PackedDoc(kind: String, id: Long, n_tokens: Long,
                             pack_id: Long)

  /** Two longs of state, corpus-size-independent (public only because
    * Catalyst's encoder codegen must construct it — not caller API).
    */
  final case class PackState(totalTokens: Long, maxId: Long)

  /** Stateless per-row prep: id + token count (all the heavy work,
    * distributed over the stream's input partitions).
    */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): Dataset[DocTokens] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .as[DocTokens]
  }

  /** The stateful core: `pack_id = (priorTokens + exclusive-prefix) div
    * budget` with the prefix accumulated in state across micro-batches.
    * `priorTokens` / `maxPackedId` seed the state from the already-
    * packed corpus' manifest (0 / Long.MinValue for a fresh corpus).
    * Works on a streaming OR batch Dataset — in batch mode the whole
    * corpus arrives as one group with the seeded initial state, which
    * is exactly the one-micro-batch streaming run (the parity lever the
    * spec uses).
    */
  def assignPacks(docs: Dataset[DocTokens], budget: Long,
                  priorTokens: Long = 0L,
                  maxPackedId: Long = Long.MinValue): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(budget > 0, "budget must be positive")
    require(priorTokens >= 0, "priorTokens must be non-negative")
    docs
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, batch: Iterator[DocTokens], state: GroupState[PackState]) =>
          var st = state.getOption.getOrElse(
            PackState(priorTokens, maxPackedId))
          val out = Seq.newBuilder[PackedDoc]
          for (doc <- batch.toArray.sortBy(_.id)) {
            if (doc.id <= st.maxId)
              out += PackedDoc("violation", doc.id, doc.n_tokens, -1L)
            else {
              // integer div on nonneg longs — exact past 2^53 tokens,
              // the Packing.packByTokenBudget overflow argument
              out += PackedDoc("pack", doc.id, doc.n_tokens,
                st.totalTokens / budget)
              st = PackState(st.totalTokens + doc.n_tokens, doc.id)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** The emitted assignments of a hit table (a batch query over the
    * sink): `id, n_tokens, pack_id` for the in-contract rows.
    */
  def packedDocs(hits: DataFrame): DataFrame =
    hits.filter(col("kind") === "pack")
      .select(col("id"), col("n_tokens"), col("pack_id"))

  /** Violation marker rows — the consumer's repack list. */
  def violations(hits: DataFrame): DataFrame =
    hits.filter(col("kind") === "violation")
      .select(col("id"), col("n_tokens"))
}
