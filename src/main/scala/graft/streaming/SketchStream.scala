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

  import org.apache.datasketches.kll.KllDoublesSketch

  /** One emitted KLL refresh: the quantile-family twin of
    * [[SketchUpdate]]. `n` is the total values folded so far (exact
    * mode holds while n ≤ k).
    */
  final case class KllUpdate(key: String, kll: Array[Byte], n: Long,
                             upto: Long)

  /** State payload for [[kllByKey]]. */
  final case class KllState(bytes: Array[Byte], n: Long, batches: Long)

  /** Per-key streaming KLL (quantile) maintenance over
    * (keyCol, double valueCol) rows — running per-shard distribution
    * state (doc lengths, quality scores) folding each micro-batch.
    * Unlike the theta twin, exact-mode KLL images are NOT
    * byte-invariant to batch slicing (the level-0 buffer keeps
    * insertion order), so the invariance contract is QUANTILE equality
    * (spec-pinned), matching the batch gates' exact-mode convention.
    */
  def kllByKey(rows: DataFrame, keyCol: String, valueCol: String,
               k: Int = 200): Dataset[KllUpdate] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KllState, KllUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val fresh = KllDoublesSketch.newHeapInstance(k)
          var added = 0L
          it.foreach { case (_, v) =>
            v.foreach { x => fresh.update(x); added += 1 } }
          if (added == 0) Iterator.empty
          else {
            val merged = KllDoublesSketch.newHeapInstance(k)
            val prior = state.getOption
            prior.foreach(p => merged.merge(
              KllDoublesSketch.heapify(
                org.apache.datasketches.memory.Memory.wrap(p.bytes))))
            merged.merge(fresh)
            val n = prior.map(_.n).getOrElse(0L) + added
            val upto = prior.map(_.batches).getOrElse(0L) + 1L
            val bytes = merged.toByteArray
            state.update(KllState(bytes, n, upto))
            Iterator.single(KllUpdate(key, bytes, n, upto))
          }
      }
  }

  import org.apache.spark.util.sketch.CountMinSketch

  /** One emitted CMS refresh — the point-frequency member: `n` counts
    * values folded so far.
    */
  final case class CmsUpdate(key: String, cms: Array[Byte], n: Long,
                             upto: Long)

  /** State payload for [[cmsByKey]]. */
  final case class CmsState(bytes: Array[Byte], n: Long, batches: Long)

  /** Per-key streaming Count-Min maintenance over (keyCol, string
    * valueCol) rows — running per-shard POINT-FREQUENCY state ("how
    * often does this token/URL/fingerprint occur"), completing the
    * streaming trio next to [[thetaByKey]] (how many distinct) and
    * [[kllByKey]] (what distribution). Same (eps, confidence, seed)
    * params as [[graft.operators.SketchStats.shardCms]] so streamed
    * states merge with batch-built ones. CMS images at fixed seed are
    * deterministic and merge is cellwise addition, so cross-batch
    * state equals the one-shot fold BYTE-FOR-BYTE (spec-pinned, the
    * theta convention — unlike KLL there is no order-dependent
    * buffer).
    */
  def cmsByKey(rows: DataFrame, keyCol: String, valueCol: String,
               eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): Dataset[CmsUpdate] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col(keyCol).cast("string"), col(valueCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CmsState, CmsUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val fresh = CountMinSketch.create(eps, confidence, seed)
          var added = 0L
          it.foreach { case (_, v) =>
            if (v != null) { fresh.addString(v); added += 1 } }
          if (added == 0) Iterator.empty
          else {
            val prior = state.getOption
            val merged = prior match {
              case Some(p) =>
                val m = CountMinSketch.readFrom(
                  new java.io.ByteArrayInputStream(p.bytes))
                m.mergeInPlace(fresh); m
              case None => fresh
            }
            val out = new java.io.ByteArrayOutputStream()
            merged.writeTo(out)
            val bytes = out.toByteArray
            val n = prior.map(_.n).getOrElse(0L) + added
            val upto = prior.map(_.batches).getOrElse(0L) + 1L
            state.update(CmsState(bytes, n, upto))
            Iterator.single(CmsUpdate(key, bytes, n, upto))
          }
      }
  }

  /** Reduce an emitted-updates frame to the LATEST state per key —
    * (key, <stateCol>) rows in the
    * [[graft.operators.SketchStats.saveStates]] shape. `stateCol` is
    * "theta" for [[thetaByKey]] output, "kll" for [[kllByKey]].
    */
  def latestStates(updates: DataFrame,
                   stateCol: String = "theta"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(desc("upto"))
    updates.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("key"), col(stateCol))
  }
}
