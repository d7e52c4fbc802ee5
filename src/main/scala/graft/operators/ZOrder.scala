package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Sorting a 100 TB table by one column gives parquet min/max pruning
  * on that column only; interleaving the bits of two (or more) key
  * columns into one sort key gives every file a tight bounding box on
  * ALL interleaved dimensions — so predicates on either column skip
  * most files. This is the standard lakehouse layout technique for
  * multi-column point/range workloads, expressed here as plain Spark:
  * z-value as a codegen-able bitwise expression, then
  * `repartitionByRange` + `sortWithinPartitions` on it (one range
  * shuffle, scales linearly; file count = target partition count).
  *
  * The z-value is deterministic arithmetic, so the gate oracle checks
  * it bit-for-bit in DuckDB with the same shift/mask formula; the
  * layout payoff (per-file key ranges shrink on BOTH dimensions vs a
  * naturally-ordered write) is pinned in `ZOrderSpec`.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** The matching SQL text (DuckDB/ANSI bitwise ops) for oracles. */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})",
          s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")

  /** Write `df` clustered by the z-value of (colA, colB): one range
    * shuffle on the z-key, sorted within partitions, one file per
    * partition — each file then has tight min/max on BOTH columns.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    path: String, partitions: Int = 8,
                    bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
