package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: salt the skewed (large) side's key into
  * `saltFactor` sub-keys and explode the small side to match — the
  * standard fix when one hot key would otherwise pin a whole join on a
  * single task.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * operator is for the cases AQE can't re-plan (e.g. aggregation-free
  * joins feeding a shuffle consumer, or deliberate static plans) and as
  * the explicit, testable form of the technique. Correctness: every
  * original pair (l, r) appears exactly once because the right side is
  * replicated across exactly the salt domain and the left side draws one
  * deterministic salt per row.
  */
object SaltedJoin {

  /** Inner equi-join `left.key == right.key` with left-side salting.
    *
    * @param left       the large, possibly skewed side
    * @param right      the smaller side (replicated saltFactor times)
    * @param key        join key column name (same on both sides)
    * @param saltFactor number of sub-keys per hot key
    */
  def innerOnKey(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // deterministic salt from row content (xxhash64 of key + a row hash),
    // not rand(): replayable plans hash-compare across runs
    val salted = left.withColumn(
      "__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
