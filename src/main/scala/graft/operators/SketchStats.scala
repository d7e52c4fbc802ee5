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
}
