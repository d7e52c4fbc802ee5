package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sessionization over event streams — the canonical stateful
  * enrichment for behavioral training data.
  *
  * Spark-first: gap-based sessions use the *built-in*
  * `session_window` (declarative, works identically in batch and
  * Structured Streaming with watermark-bounded state) rather than a
  * hand-rolled mapGroupsWithState — custom state is reserved for
  * logic the built-in genuinely can't express ([[userActivity]]'s
  * imperative per-group scan).
  */
object Sessionize {

  /** Gap-based sessions per user: session closes after `gap` of
    * inactivity. Works on a batch frame or a watermarked stream.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
           round(sum("value"), 2).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"))

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserActivity(
      user_id: Long, n_events: Long,
      first_ts: String, last_ts: String, max_gap_seconds: Long)

  /** Typed per-group imperative scan (KeyValueGroupedDataset): per-user
    * activity summary incl. the largest inter-event gap. The in-memory
    * sort inside each group is bounded by per-user cardinality — the
    * shuffle is one exchange on user_id.
    */
  def userActivity(spark: SparkSession, events: DataFrame): Dataset[UserActivity] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        // formatter built inside the task: DateTimeFormatter is not
        // serializable and must not be captured by the closure
        val fmt = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
        val ts = it.map(_.ts.getTime).toArray.sorted
        val maxGap = if (ts.length < 2) 0L
          else ts.sliding(2).map(p => p(1) - p(0)).max / 1000L
        UserActivity(uid, ts.length,
          fmt.format(java.time.Instant.ofEpochMilli(ts.head)),
          fmt.format(java.time.Instant.ofEpochMilli(ts.last)),
          maxGap)
      }
  }
}
