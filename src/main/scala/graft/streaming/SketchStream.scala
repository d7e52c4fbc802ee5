package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming mergeable-sketch maintenance — the streaming BUILD half of
  * the [[graft.operators.SketchStats]] stored-state lifecycle: per-key
  * theta sketches live in the STATE STORE as their serialized compact
  * images and fold each arriving micro-batch in, so a continuously
  * ingesting pipeline keeps per-shard distinct counts current without
  * ever rescanning what already streamed past. Every batch that touches
  * a key emits the key's refreshed (key, theta, est, upto) row; the
  * latest `upto` per key is the current state, and writing those rows
  * through [[graft.operators.SketchStats.saveStates]] lands the exact
  * table the batch stored-state gates answer from — stream in, merge
  * forever.
  *
  * Scale shape: the only shuffle is the groupByKey on the sketch key
  * (shard-sized groups); state per key is one KB-bounded compact image
  * (k = nominalEntries caps it); no watermark needed — the state is a
  * monotone fold, not a window. Determinism: in exact mode
  * (distinct ≤ nominalEntries) a compact theta image stores the SORTED
  * retained hashes, so the emitted bytes are independent of arrival
  * order and batch slicing (spec-pinned: two-batch streaming state ==
  * one-shot batch fold, byte-for-byte).
  */
object SketchStream {

  import org.apache.datasketches.theta.{SetOperation, Sketches, UpdateSketch}
  import org.apache.datasketches.memory.Memory

  /** One emitted state refresh: `upto` counts the batches folded into
    * this key so far — consumers keep the max-`upto` row per key.
    */
  final case class SketchUpdate(key: String, theta: Array[Byte],
                                est: Double, upto: Long)

  /** State-store payload: the compact image + batches-folded counter. */
  final case class ThetaState(bytes: Array[Byte], batches: Long)

  /** Per-key streaming theta maintenance over (keyCol, valueCol) rows.
    * Works identically on a static frame (one "batch", upto = 1) — the
    * batch-parity surface the spec pins.
    */
  def thetaByKey(rows: DataFrame, keyCol: String, valueCol: String,
                 nominalEntries: Int = 1 << 14): Dataset[SketchUpdate] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col(keyCol).cast("string"), col(valueCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ThetaState, SketchUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val upd = UpdateSketch.builder()
            .setNominalEntries(nominalEntries).build()
          var n = 0L
          it.foreach { case (_, v) => if (v != null) { upd.update(v); n += 1 } }
          if (n == 0) Iterator.empty
          else {
            val u = SetOperation.builder()
              .setNominalEntries(nominalEntries).buildUnion()
            val prior = state.getOption
            prior.foreach(p => u.union(Sketches.wrapSketch(Memory.wrap(p.bytes))))
            u.union(upd.compact())
            val res = u.getResult
            val bytes = res.toByteArray
            val upto = prior.map(_.batches).getOrElse(0L) + 1L
            state.update(ThetaState(bytes, upto))
            Iterator.single(SketchUpdate(key, bytes, res.getEstimate, upto))
          }
      }
  }

  /** Reduce an emitted-updates frame to the LATEST state per key —
    * (key, theta) rows in the [[graft.operators.SketchStats.saveStates]]
    * shape.
    */
  def latestStates(updates: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(desc("upto"))
    updates.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("key"), col("theta"))
  }
}
