package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{Collect, ImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a HARD per-group buffer bound (r19, the
  * ADVICE r18 skew-guard fix): the aggregation buffer stops growing at
  * `bound` elements, so a degenerate bucket (pathological boilerplate
  * — millions of rows sharing one group key) costs O(bound) executor
  * memory instead of O(bucket), in the partial, the merge, AND the
  * final buffer.
  *
  * Contract for the LSH skew guard (`bound = maxBucket + 1`): a group
  * with ≤ maxBucket rows collects EVERY element (the result is plain
  * collect_list); a group with more rows yields exactly `bound`
  * elements — enough for a `size(ids) <= maxBucket` filter to detect
  * and drop it, which is the only consumer of an over-bound result
  * (WHICH bound elements survive is arrival-order-dependent, exactly
  * like plain collect_list's element order, so callers must either
  * drop over-bound groups or be order/subset-insensitive).
  *
  * Why not a window-count pre-filter: measured r19, the window's
  * sort + extra pass cost 8–13% on the minhash-family gates; why not
  * a count + broadcast anti-join: 18–37% (a second banding derivation
  * plus a broadcast-build job per call). This expression keeps the r18
  * single-aggregation plan shape (ObjectHashAggregate, one exchange)
  * and fixes only the buffer bound — the TypedImperativeAggregate
  * machinery (serialize/deserialize, buffer element conversion) is
  * inherited from Spark's own [[Collect]] base class.
  */
case class CollectListCapped(
    child: Expression,
    bound: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(bound > 0, "collect_list_capped: bound must be positive")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override lazy val bufferElementType: DataType = child.dataType

  override def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override def update(buffer: mutable.ArrayBuffer[Any],
                      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length >= bound) buffer else super.update(buffer, input)

  override def merge(buffer: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any])
      : mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length < bound && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(
      newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): CollectListCapped = copy(child = newChild)

  override def prettyName: String = "collect_list_capped"
}

object CollectListCapped {
  /** Column API: `collect_list_capped(e, bound)`. */
  def apply(e: Column, bound: Int): Column =
    GraftColumnBridge.column(
      CollectListCapped(GraftColumnBridge.expression(e), bound)
        .toAggregateExpression())
}
