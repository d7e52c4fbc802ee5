package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bytes-targeted widths for materialization (lineage-cut) boundaries.
  *
  * Checkpoint/persist boundaries FREEZE their partition count: the
  * materialized RDD keeps whatever width the plan above produced —
  * usually `spark.sql.shuffle.partitions` — and every post-checkpoint
  * stage inherits it, BELOW the reach of AQE's shuffle coalescing
  * (measured: `coalescePartitions.parallelismFirst=false` does NOT
  * recover it — BASELINE.md round-10 shuffle-tax adjudication, A/C =
  * 1.66× at shuffle=128 on `q_llm_data_pipeline`). A pipeline run under
  * a mis-sized cluster config pays per-task scheduling floors on every
  * small post-checkpoint stage, silently.
  *
  * The fix is to make the boundary SELF-SIZING: repartition to
  * `clamp(ceil(bytes / targetPartitionBytes), defaultParallelism,
  * maxPartitions)` before materializing, so post-checkpoint width
  * tracks DATA VOLUME, not the shuffle config — the same shape Spark's
  * own file-scan split sizing uses (`maxPartitionBytes` with a
  * `defaultParallelism` floor). At 100 TB the bytes term dominates
  * (~1.6M partitions at the 64 MB default); at test scale the
  * `defaultParallelism` floor keeps CPU-dense post-checkpoint stages at
  * full thread-count parallelism. Either way the width is independent
  * of `spark.sql.shuffle.partitions` (pinned in LineageSpec).
  *
  * Bytes come from Catalyst plan statistics (`optimizedPlan.stats`) —
  * free, no job. Cut points should sit at scan-derived map/filter/join
  * boundaries where those stats are meaningful; `maxPartitions` is the
  * loud backstop against a degenerate estimate (a LogicalRDD leaf or a
  * product-join default can report `Long.MaxValue`-ish sizes). Callers
  * that KNOW their cardinality (e.g. connected-components rounds, which
  * hold the participant count) should use [[widthForBytes]] directly
  * instead of trusting stats on a stats-less leaf.
  */
object Lineage {

  /** 64 MB — parquet-row-group-sized partitions, Spark's own
    * `files.maxPartitionBytes` shape. */
  val DefaultTargetPartitionBytes: Long = 64L << 20

  /** clamp(ceil(bytes/target), 2·defaultParallelism, maxPartitions).
    * The floor is 2× the slot count, not 1×: post-boundary stages are
    * CPU-dense per-row work (signatures, HOF token programs) whose
    * per-partition cost is uneven — exactly one task per core leaves
    * zero slack for stragglers (measured: a 32-task coalesce at 32
    * cores trailed the un-coalesced 128-task plan on the llm
    * pipeline). 2–3 tasks per slot is the standard balance rule; the
    * bytes term still dominates at real scale.
    */
  def widthForBytes(spark: SparkSession, bytes: BigInt,
                    targetPartitionBytes: Long = DefaultTargetPartitionBytes,
                    maxPartitions: Int = 1 << 20): Int = {
    require(targetPartitionBytes > 0, "targetPartitionBytes must be positive")
    val byBytes = (bytes.max(0) + targetPartitionBytes - 1) / targetPartitionBytes
    val minW = BigInt(math.max(1, 2 * spark.sparkContext.defaultParallelism))
    byBytes.max(minW).min(BigInt(maxPartitions)).toInt
  }

  /** Bytes estimate for a cut point. Catalyst's top-level
    * `stats.sizeInBytes` is a PRODUCT across join children — after two
    * joins it exceeds any real size by orders of magnitude, and a
    * stats-less leaf (LogicalRDD without origin stats) reports
    * `defaultSizeInBytes` ≈ Long.Max. Both failure modes would widen
    * the boundary to `maxPartitions` and materialize a MILLION-task
    * stage (measured: the first wiring of `cut` did exactly that on the
    * post-join pipeline boundaries — a 2^20-partition repartition spent
    * 30+ minutes deserializing task closures at test scale). A cut
    * point in a curation pipeline is a row-subset of its inputs, so
    * the SUM OF KNOWN LEAF SIZES bounds it: the estimate is
    * min(topStats, Σ known leaves), and None when no leaf size is
    * known — callers with a real cardinality use [[widthForBytes]]
    * directly (the connectedComponents pattern).
    */
  def estimateBytes(df: DataFrame): Option[BigInt] = {
    val plan = df.queryExecution.optimizedPlan
    val unknown = BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes)
    val knownLeaves = plan.collectLeaves()
      .map(_.stats.sizeInBytes).filter(_ < unknown)
    if (knownLeaves.isEmpty) None
    else Some(plan.stats.sizeInBytes.min(knownLeaves.sum))
  }

  /** Leaf-clamped plan-stats width for `df`; the defaultParallelism
    * floor when no input size is known. */
  def targetWidth(df: DataFrame,
                  targetPartitionBytes: Long = DefaultTargetPartitionBytes,
                  maxPartitions: Int = 1 << 20): Int =
    estimateBytes(df) match {
      case Some(bytes) =>
        widthForBytes(df.sparkSession, bytes, targetPartitionBytes,
          maxPartitions)
      case None =>
        math.max(1, 2 * df.sparkSession.sparkContext.defaultParallelism)
    }

  /** The self-sizing lineage cut: bytes-targeted `coalesce`, then lazy
    * `localCheckpoint` — the drop-in for the bare
    * `.localCheckpoint(false)` boundary.
    *
    * COALESCE, not repartition (measured): an over-wide upstream
    * (shuffle=128 on a 32-core box) is merged down to the target with
    * a NARROW dependency — no exchange. The first implementation used
    * `repartition`, and the extra full-data exchange of heavy rows
    * (text + token arrays) at the boundary cost ~3.4 s on the sf0.1
    * llm pipeline at shuffle=128 — interleaved-A/B'd against the
    * pre-cut binary (BASELINE round 11). Coalesce cannot GROW a
    * too-narrow upstream; that direction doesn't arise at a cut point
    * (the width below a shuffle is the configured/AQE width, and at
    * real scale inputs set it high) — so the guarantee is width ≤
    * target, with the upstream width as the floor. (On a real cluster,
    * substitute reliable `checkpoint()` for fault tolerance; the width
    * logic is the part that transfers.)
    */
  def cut(df: DataFrame,
          targetPartitionBytes: Long = DefaultTargetPartitionBytes,
          maxPartitions: Int = 1 << 20): DataFrame = {
    val out = df.coalesce(targetWidth(df, targetPartitionBytes, maxPartitions))
    // dev drill-down: GRAFT_CUT_EXPLAIN=1 prints the physical plan the
    // checkpoint materialization will execute (the stage-attribution
    // blind spot — checkpoint jobs never appear in the final plan)
    if (sys.env.contains("GRAFT_CUT_EXPLAIN"))
      println("[lineage-cut plan]\n" +
        out.queryExecution.executedPlan.toString.take(4000))
    out.localCheckpoint(false)
  }
}
