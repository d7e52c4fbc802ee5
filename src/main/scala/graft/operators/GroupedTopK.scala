package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable per-group top-k: `row_number` over a per-group ordering,
  * filtered to rank ≤ k.
  *
  * Scale path: Catalyst's `InferWindowGroupLimit` (Spark ≥ 3.5) rewrites
  * the rank-filter into a `WindowGroupLimit` that keeps only k rows per
  * group BEFORE the shuffle feeding the window sort — so at 100 TB the
  * shuffle carries ~k·|groups| rows, not the full table. `PlanSpec` pins
  * this plan shape.
  *
  * Capability extension beyond the reference: its top-k patterns
  * (`musemotion-queries.sql:77-88`) are global LIMITs; per-group ranking
  * is the natural next operator (SURVEY.md §2.9 extension target).
  */
object GroupedTopK {

  /** @param rankCol name for the emitted 1-based rank column.
    * @param ordering MUST be total per group (append a unique tiebreaker
    *                 key) or results are nondeterministic under retries.
    */
  def apply(df: DataFrame, partitionCols: Seq[String],
            ordering: Seq[Column], k: Int,
            rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
