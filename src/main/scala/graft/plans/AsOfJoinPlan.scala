package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow,
  NamedExpression, RowOrdering, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** As-of (backward) join as a first-class plan node — the full custom-
  * operator tier (SURVEY.md §7.3 preference (c)): logical plan +
  * planner strategy + physical operator, registered through
  * `SparkSessionExtensions` / `experimental.extraStrategies`.
  *
  * Versus the window-composed [[graft.operators.AsOfJoin]] (same
  * semantics, same oracle): both cost one shuffle per side + an
  * in-partition sort, but the physical operator replaces the unioned
  * window carry (which materializes every right row through the window
  * frame machinery and re-projects the payload struct) with a single
  * streaming two-pointer merge per partition — O(1) state per key, no
  * struct boxing, no union of mismatched schemas. At 100 TB the shuffle
  * still dominates, but the merge removes the window's per-row frame
  * evaluation and the 2× row inflation of the union.
  *
  * Matching rule: latest right row with the same key and
  * `right.time <= left.time` (ties match, as in DuckDB's ASOF JOIN).
  * Right rows with NULL time are skipped; a NULL left time matches
  * nothing.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[NamedExpression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.toAttribute.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: both children hash-clustered on the keys and
  * sorted by (keys, time); each partition pair merges with two
  * pointers, remembering only the latest right payload for the current
  * key.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[NamedExpression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.toAttribute.withNullability(true))

  // co-partition both sides on the equality keys (EnsureRequirements
  // inserts compatible exchanges, or reuses existing partitioning)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // in-partition merge order: keys, then event time
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val numPayload = rightPayload.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeEval = BindReferences.bindReference(leftTime, left.output)
      val rTimeEval = BindReferences.bindReference(rightTime, right.output)
      val payloadProj = UnsafeProjection.create(rightPayload, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val joiner = new JoinedRow
      val nullPayload = new GenericInternalRow(numPayload)
      val result = UnsafeProjection.create(
        output.map(_.dataType).toArray)

      new Iterator[InternalRow] {
        private var curRight: InternalRow = _        // buffered unconsumed
        private var lastMatch: InternalRow = _       // payload copy
        private var lastMatchKey: InternalRow = _    // its key copy

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTime = lTimeEval.eval(lRow)
          if (lTime == null) {
            // NULL left time matches nothing
            return result(joiner(lRow, nullPayload))
          }
          var advancing = true
          while (advancing && (curRight != null || rIter.hasNext)) {
            if (curRight == null) curRight = rIter.next()
            val rKey = rKeyProj(curRight)
            val cmp = keyOrd.compare(rKey, lKey)
            if (cmp < 0) {
              curRight = null                        // smaller key: discard
            } else if (cmp == 0) {
              val rTime = rTimeEval.eval(curRight)
              if (rTime == null) {
                curRight = null                      // NULL right time: skip
              } else if (timeOrd.asInstanceOf[Ordering[Any]]
                           .compare(rTime, lTime) <= 0) {
                lastMatch = payloadProj(curRight).copy()
                lastMatchKey = rKey.copy()
                curRight = null
              } else advancing = false               // future row: stop
            } else advancing = false                 // bigger key: stop
          }
          val matched =
            if (lastMatchKey != null && keyOrd.compare(lastMatchKey, lKey) == 0)
              lastMatch
            else nullPayload
          result(joiner(lRow, matched))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point mirroring
  * [[graft.operators.AsOfJoin.backward]] (same argument conventions,
  * same output column order).
  */
object AsOfJoinExecOp {

  def backward(left: DataFrame, right: DataFrame,
               keys: Seq[String], timeCol: String): DataFrame = {
    val spark = SparkSession.active
    // make sure the strategy is installed (idempotent)
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == timeCol).toIndexedSeq
    require(payloadCols.nonEmpty, "right side has no payload columns")
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"column collisions: $collisions")

    val lPlan = left.queryExecution.analyzed
    // self-join safety: if both sides derive from the same scan they
    // share exprIds, which corrupts column pruning across the custom
    // node — re-alias the right side to fresh ids (what the analyzer's
    // dedup rule does for standard joins)
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan: LogicalPlan =
      if (rAnalyzed.outputSet.intersect(lPlan.outputSet).isEmpty) rAnalyzed
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rAnalyzed.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
        rAnalyzed)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not found in ${plan.output.map(_.name)}"))

    val joined = GraftColumnBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, timeCol), attr(rPlan, timeCol),
      payloadCols.map(attr(rPlan, _))))

    // match the composed operator's column order:
    // keys, time, left payload, right payload
    val leftRest = left.columns.filterNot(c => keys.contains(c) || c == timeCol)
    joined.select(
      keys.map(col) ++ Seq(col(timeCol)) ++
      leftRest.map(col) ++ payloadCols.map(col): _*)
  }
}
