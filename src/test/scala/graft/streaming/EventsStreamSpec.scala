package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class EventsStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming hourly agg (availableNow) equals the batch plan") {
    val streamed = EventsStream.hourlyCounts(EventsStream.readEvents(spark, sf))
    val got = EventsStream.runToCompletion(spark, streamed)
      .orderBy("hour", "event_type").collect()

    val batch = graft.Tables.events(spark, sf)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00")
          .as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour", "event_type").collect()

    assert(got.length == batch.length && got.length > 0)
    got.zip(batch).foreach { case (g, b) => assert(g == b) }
  }

  test("dropDuplicatesWithinWatermark dedupes by event_id") {
    // double the stream source rows by reading twice and unioning is not
    // possible for a file stream; instead verify on the single source
    // that no event_id survives twice.
    val deduped = EventsStream.dedupedEvents(EventsStream.readEvents(spark, sf))
    val got = EventsStream.runToCompletion(spark, deduped, outputMode = "append")
    assert(got.groupBy("event_id").count().filter(col("count") > 1).isEmpty)
    assert(got.count() > 0)
  }
}
