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

  /** clamp(ceil(bytes/target), defaultParallelism, maxPartitions) */
  def widthForBytes(spark: SparkSession, bytes: BigInt,
                    targetPartitionBytes: Long = DefaultTargetPartitionBytes,
                    maxPartitions: Int = 1 << 20): Int = {
    require(targetPartitionBytes > 0, "targetPartitionBytes must be positive")
    val byBytes = (bytes.max(0) + targetPartitionBytes - 1) / targetPartitionBytes
    val minW = BigInt(math.max(1, spark.sparkContext.defaultParallelism))
    byBytes.max(minW).min(BigInt(maxPartitions)).toInt
  }

  /** Plan-stats width for `df` (see class doc for when stats are
    * trustworthy). */
  def targetWidth(df: DataFrame,
                  targetPartitionBytes: Long = DefaultTargetPartitionBytes,
                  maxPartitions: Int = 1 << 20): Int =
    widthForBytes(df.sparkSession,
      df.queryExecution.optimizedPlan.stats.sizeInBytes,
      targetPartitionBytes, maxPartitions)

  /** The self-sizing lineage cut: bytes-targeted round-robin
    * repartition, then lazy `localCheckpoint` — the drop-in for the
    * bare `.localCheckpoint(false)` boundary. (On a real cluster,
    * substitute reliable `checkpoint()` for fault tolerance; the width
    * logic is the part that transfers.)
    */
  def cut(df: DataFrame,
          targetPartitionBytes: Long = DefaultTargetPartitionBytes,
          maxPartitions: Int = 1 << 20): DataFrame =
    df.repartition(targetWidth(df, targetPartitionBytes, maxPartitions))
      .localCheckpoint(false)
}
