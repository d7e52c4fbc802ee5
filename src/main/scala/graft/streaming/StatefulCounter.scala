package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — the extension
  * point for per-key logic the built-in stateful operators can't
  * express (SURVEY.md §2.9). Demonstrated as a per-user running
  * counter/sum that survives across micro-batches; each batch emits the
  * updated totals for the users it touched.
  *
  * State is per-key in the state store (RocksDB/HDFS-backed on a
  * cluster), so memory scales with distinct keys, not events.
  */
object StatefulCounter {

  final case class UserEventIn(user_id: Long, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  def runningTotals(
      spark: SparkSession,
      events: Dataset[UserEventIn]): Dataset[UserTotals] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEventIn], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var sum = prev.total_value
          batch.foreach { e => n += 1; sum += e.value }
          // state carries the RAW sum; only emissions round. Rounding the
          // state would re-accumulate from rounded values, making totals
          // depend on micro-batch boundaries (file splits) — the gate
          // compares against a batch oracle, so results must be
          // batch-split-invariant.
          state.update(UserTotals(uid, n, sum))
          Iterator.single(UserTotals(uid, n, math.rint(sum * 100) / 100))
      }
  }
}
