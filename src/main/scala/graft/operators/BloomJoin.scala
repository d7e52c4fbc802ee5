package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter pre-join pruning: build a Bloom filter over the (small,
  * selective) dimension side's join keys, probe it on the fact side
  * BEFORE the join shuffle, then run the exact join to remove the false
  * positives.
  *
  * Why this matters at 100 TB: a fact⋈dim shuffle join moves the WHOLE
  * fact table through the exchange even when the dimension is highly
  * selective (post-filter) — the rows that can't match are discarded
  * only after being hashed, serialized, and shuffled. Probing a
  * broadcast Bloom filter at the scan cuts the shuffled volume to
  * ~(match rate + false-positive rate) of the fact table for the cost
  * of one tiny aggregate on the dim side. This is exactly what Spark's
  * AQE runtime-filter feature injects when its heuristics fire;
  * expressing it explicitly makes the pruning deterministic and
  * independent of those heuristics.
  *
  * Semantics-preserving by construction: Bloom "might contain" has no
  * false negatives, and the exact join removes false positives — so the
  * result equals the plain join (the oracle checks this).
  *
  * The bloom reaches the probe side as a SCALAR SUBQUERY — the only
  * shape `might_contain` accepts besides a literal — which Spark
  * executes once as its own subquery stage and then inlines into the
  * fact scan's filter, exactly like the optimizer's injected runtime
  * filter. No driver-side collect in user code.
  */
object BloomJoin {

  /** `bloom_filter_agg(xxhash64(key))` as a Column. */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(xxhash64(key)), expectedItems)
        .toAggregateExpression())

  /** `might_contain(bloom, xxhash64(key))` as a Column. */
  def mightContain(bloom: Column, key: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(
        GraftColumnBridge.expression(bloom),
        GraftColumnBridge.expression(xxhash64(key))))

  /** Inner-join `fact ⋈ dim` with the fact side Bloom-pruned first.
    *
    * @param expectedItems sizing hint for the filter (dim-side distinct
    *                      keys); at scale pass a stats-derived estimate.
    */
  /** The dim-side bloom build as a scalar-subquery Column. */
  def bloomOf(dim: DataFrame, dimKey: String, expectedItems: Long): Column =
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        dim.agg(bloomAgg(col(dimKey), expectedItems).as("__bloom"))
          .queryExecution.analyzed))

  def prunedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 100000L): DataFrame = {
    val pruned = fact.where(
      mightContain(bloomOf(dim, dimKey, expectedItems), col(factKey)))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
