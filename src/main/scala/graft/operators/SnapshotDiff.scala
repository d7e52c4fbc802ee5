package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the CDC primitive: classify every key across
  * two table versions as added / removed / changed (unchanged rows are
  * dropped). One full-outer join on the key; value comparison is
  * null-safe per column, so NULL→value and value→NULL edits are
  * changes, not misses.
  *
  * Scale shape: both sides shuffle once on the key (or zero times if
  * both snapshots are bucketed on it — Sinks.writeBucketed); the
  * comparison is a codegen'd projection. Extends the reference's
  * CRUD-as-snapshot model (SURVEY.md §2.8) with the inverse operation:
  * recovering the change set from two states.
  */
object SnapshotDiff {

  /** @param keyCols join key (must be unique per snapshot)
    * @return keyCols ++ (status: added|removed|changed)
    */
  def diff(before: DataFrame, after: DataFrame,
           keyCols: Seq[String]): DataFrame = {
    val valueCols = before.columns.filterNot(keyCols.contains).toSeq
    require(valueCols.nonEmpty, "no value columns to compare")
    val b = before.select(
      keyCols.map(col) :+ struct(valueCols.map(col): _*).as("b_vals"): _*)
    val a = after.select(
      keyCols.map(col) :+ struct(valueCols.map(col): _*).as("a_vals"): _*)
    val status: Column =
      when(col("b_vals").isNull, lit("added"))
        .when(col("a_vals").isNull, lit("removed"))
        .otherwise(lit("changed"))
    b.join(a, keyCols, "full_outer")
      .filter(col("b_vals").isNull || col("a_vals").isNull ||
              !(col("b_vals") <=> col("a_vals")))
      .select(keyCols.map(col) :+ status.as("status"): _*)
  }
}
