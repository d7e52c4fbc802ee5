package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: enrich each left row with the most recent
  * right row at-or-before its timestamp, per key — the standard
  * alignment operator for event/feature streams in training-data
  * pipelines (and DuckDB's native `ASOF JOIN`, which the oracle uses).
  *
  * Spark-first composition (SURVEY.md §7.3 preference order: compose
  * built-ins before custom strategies): union both sides tagged by
  * priority, one window per key ordered by (time, side) with
  * `last(payload, ignoreNulls)` carrying the latest right payload
  * forward, then keep left rows. The payload travels as ONE struct so
  * all right columns come from the SAME matched row.
  *
  * Cost: one shuffle on the key + one sort within partitions — the same
  * as a sort-merge join, with no range-explosion risk. Equal timestamps
  * match (right sorts before left at the same instant).
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     lookup timeline; columns other than keys+timeCol
    *                  become nullable output columns and must not
    *                  collide with left's names
    * @param keys      equality keys
    * @param timeCol   event-time column name (same on both sides)
    */
  def backward(left: DataFrame, right: DataFrame,
               keys: Seq[String], timeCol: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == timeCol).toIndexedSeq
    require(payloadCols.nonEmpty, "right side has no payload columns")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"column collisions: $collisions")

    val payload = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(timeCol), lit(0).as("__pri"), payload.as("__payload")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(timeCol), lit(1).as("__pri"),
        lit(null).cast(payloadType).as("__payload")) ++
      left.columns.filterNot(c => keys.contains(c) || c == timeCol)
        .map(c => col(c).as(s"__l_$c")): _*)

    val unioned = taggedRight
      .select(taggedLeft.columns.toIndexedSeq.map(c =>
        if (taggedRight.columns.contains(c)) col(c)
        else lit(null).cast(taggedLeft.schema(c).dataType).as(c)): _*)
      .unionByName(taggedLeft)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__pri").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val enriched = unioned
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__pri") === 1)

    val leftBack = left.columns.filterNot(c => keys.contains(c) || c == timeCol)
      .map(c => col(s"__l_$c").as(c))
    enriched.select(
      keys.map(col) ++ Seq(col(timeCol)) ++ leftBack ++
      payloadCols.map(c => col("__matched").getField(c).as(c)): _*)
  }
}
