package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for incremental corpus statistics —
  * the shard-resumable counterpart of `COUNT(DISTINCT …)`. At 100 TB a
  * corpus-wide distinct count is a full-scan shuffle every time it is
  * asked; the sketch shape computes one KB-sized HLL state PER SHARD
  * once (map-side partial agg, one row per shard), stores it next to
  * the shard, and answers corpus-wide (or any shard-subset) questions
  * later by UNIONING states — no rescan, associative, idempotent, the
  * same pattern as [[Dedup.signatureTable]]'s stored signatures.
  *
  * Built on Spark's native Apache DataSketches HLL functions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`,
  * Spark 3.5+) — codegen'd aggregates, not UDFs. Error at the default
  * lgConfigK=12 is ~1.6% RSE; both the per-shard estimates and the
  * merged estimate are deterministic for a fixed input (the sketch is
  * content-hashed, not sampled).
  */
object SketchStats {

  /** One row per shard: `shardCol, n_rows, sketch` (binary HLL state of
    * the key column). The ONE corpus-sized pass; everything after works
    * on |shards| rows.
    */
  def shardSketches(df: DataFrame, shardCol: String, keyCol: String,
                    lgConfigK: Int = 12): DataFrame =
    df.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
           hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("sketch"))

  /** Distinct-count estimate per shard from stored sketches. */
  def shardEstimates(sketches: DataFrame, shardCol: String): DataFrame =
    sketches.select(col(shardCol), col("n_rows"),
      hll_sketch_estimate(col("sketch")).as("est_distinct"))

  /** Corpus-wide estimate by MERGING stored shard states — no rescan.
    * Returns one row: `est_distinct`.
    */
  def mergedEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_distinct"))

  // ---- Count-Min heavy hitters (frequency, not cardinality) ----------

  /** One row per shard: `shardCol, n_items, cms` — a Count-Min sketch
    * (binary) of the value column at (eps, confidence), FIXED seed so
    * the state is content-determined. Same store-and-merge lifecycle as
    * the HLL sketches: per-shard pass once, frequency questions later.
    */
  def shardCms(df: DataFrame, shardCol: String, valueCol: String,
               eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): DataFrame =
    df.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_items"),
           count_min_sketch(col(valueCol), lit(eps), lit(confidence),
             lit(seed)).as("cms"))

  /** Merge stored shard CMS states on the driver (the artifact is KBs
    * per shard and the shard count is operator-bounded — the same
    * driver-side-is-scale-safe argument as [[Bpe.trainFast]]'s vocab
    * table) and return the merged sketch for point queries.
    */
  def mergedCms(sketches: DataFrame,
                maxShards: Int = 100000): org.apache.spark.util.sketch.CountMinSketch = {
    val rows = sketches.select(col("cms")).limit(maxShards + 1).collect()
    require(rows.length <= maxShards,
      s"mergedCms: more than $maxShards shard sketches — merge in stages")
    require(rows.nonEmpty, "mergedCms: no shard sketches")
    val first = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(rows.head.getAs[Array[Byte]](0)))
    rows.tail.foldLeft(first) { (acc, r) =>
      acc.mergeInPlace(org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))))
    }
  }
}
