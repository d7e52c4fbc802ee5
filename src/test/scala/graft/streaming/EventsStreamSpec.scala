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

  test("RocksDB state store provider yields identical results") {
    // the beyond-heap state path claimed in SCALING.md §6: same plan,
    // same answers, state in RocksDB instead of the in-memory provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = EventsStream.hourlyCounts(EventsStream.readEvents(spark, sf))
      val got = EventsStream.runToCompletion(spark, streamed)
        .orderBy("hour", "event_type").collect()
      val hdfs = {
        spark.conf.unset(key)
        EventsStream.runToCompletion(spark,
          EventsStream.hourlyCounts(EventsStream.readEvents(spark, sf)))
          .orderBy("hour", "event_type").collect()
      }
      assert(got.length == hdfs.length && got.length > 0)
      got.zip(hdfs).foreach { case (g, b) => assert(g == b) }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("foreachBatch sink lands each micro-batch in the lake") {
    // streaming -> parquet ingestion with batch-id dedupe semantics:
    // the canonical streaming ETL sink when the target isn't a
    // streaming-native format
    val out = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_feb_sink").toString
    val q = EventsStream.readEvents(spark, sf)
      .select("event_id", "event_type", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(out)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val landed = spark.read.parquet(out)
    val src = graft.Tables.events(spark, sf).count()
    assert(landed.count() == src,
      s"landed ${landed.count()} of $src events")
    java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
  }
}
