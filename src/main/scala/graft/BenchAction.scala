package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

/** The timing action for Bench/TimeQ.
  *
  * `.count()` is the wrong action for timing a query: Catalyst prunes every
  * column the action doesn't need, so a projection-only headline (e.g. a
  * per-row tokenizer) collapses to a scan-count and the measurement says
  * nothing about the projected work. Aggregating `xxhash64(struct(<every
  * column>))` forces each output column of every row to be computed and
  * consumed on the executors, while still returning only one row to the
  * driver — so the measurement includes the full query, and only the query.
  */
object BenchAction {
  /** Runs `df` to completion consuming every output column; returns the row
    * count (callers use it to catch silently-empty results).
    */
  def consumeAll(df: DataFrame): Long = {
    val cols = df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        // xxhash64 rejects MapType (unordered); entries are hashable.
        case _: MapType => map_entries(col(f.name))
        case _          => col(f.name)
      }
    }
    val row = df.agg(
      count(lit(1)).as("n"),
      sum(xxhash64(cols: _*)).as("h")
    ).head()
    row.getLong(0)
  }
}
