package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based merge (upsert) — the Spark-native re-expression of the
  * reference's staged temp-table + `ON DUPLICATE KEY UPDATE` /
  * `ON CONFLICT DO UPDATE` flow
  * (/root/reference/load_musemotion_to_db.py:91-143).
  *
  * Instead of two network round-trips through an RDBMS, this is one
  * shuffle-on-key plan: union both sides with a precedence tag, keep the
  * first row per key. Updates win over base, matching the reference's
  * "new values overwrite" semantics.
  *
  * Scale notes: the shuffle is exactly one exchange on the merge key.
  * If the base is bucketed by the key (the 100 TB layout), only the
  * (small) updates side shuffles. Idempotence holds:
  * merge(merge(t, d), d) == merge(t, d) — pinned by a property test.
  */
object Upsert {

  /** Merge `updates` into `base` by `keys`; both must share a schema.
    * Rows in `updates` replace same-key rows in `base`; unmatched rows
    * from both sides survive.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val cols = base.columns.toIndexedSeq
    require(updates.columns.toSeq == cols.toSeq,
      s"schema mismatch: ${updates.columns.toSeq} vs $cols")
    val tagged = updates.withColumn("__pri", lit(1))
      .unionByName(base.withColumn("__pri", lit(2)))
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(col("__pri"))
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(cols.map(col): _*)
  }

  /** The reference's concrete case: EV upsert keyed on VIN
    * (/root/reference/load_musemotion_to_db.py:101,125 UNIQUE vin).
    */
  def upsertByVin(base: DataFrame, updates: DataFrame): DataFrame =
    upsert(base, updates, Seq("vin"))
}
