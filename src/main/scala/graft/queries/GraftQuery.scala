package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: a Spark-first DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  *
  * Determinism contract (SURVEY.md §5.2): every query is totally ordered
  * on its projected columns (or a unique key prefix) before any LIMIT;
  * aggregates over doubles are rounded so parallel (Spark) vs sequential
  * (DuckDB) summation order cannot flip a hash compare; no
  * `current_date()` — as-of dates are literals.
  *
  * @param headline included in the per-round Bench run when true.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

trait QuerySuite {
  def queries: Seq[GraftQuery]
}
