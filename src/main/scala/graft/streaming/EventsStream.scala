package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming rendition of the reference's blob-arrival loop
  * (/root/reference/pipeline.py:126-150): what was "list blobs, read
  * each, concat" becomes a file-source stream with event-time windowing
  * and watermark-bounded state — the §7.5 extension the reference's
  * README aspires to (/root/reference/README.md:41-42).
  *
  * Scale design: per-key state lives in the state store, bounded by the
  * watermark; `availableNow` gives batch-parity runs (process everything
  * present, then stop), which is also how the correctness gate executes
  * it against the DuckDB oracle.
  */
object EventsStream {

  /** File-source stream over the events parquet (nanos ts normalized the
    * same way as the batch loader).
    *
    * The file stream source requires a *directory*; the testdata lays
    * each table out as a single file, so stage a symlink directory under
    * java.io.tmpdir (read-only view, nothing copied).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.withEventTime(readTable(spark, dir, "events"))

  /** File-source stream over any testdata table's parquet (same
    * symlink-directory staging as the events reader; no table-specific
    * column normalization).
    */
  def readTable(spark: SparkSession, dir: String, table: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(s"$dir/$table.parquet").toAbsolutePath
    val sourceDir =
      if (Files.isDirectory(src)) src
      else {
        val stage = Paths.get(System.getProperty("java.io.tmpdir"),
          s"graft_stream_src_${Integer.toHexString(src.toString.hashCode)}")
        Files.createDirectories(stage)
        val link = stage.resolve(s"$table.parquet")
        if (!Files.exists(link)) Files.createSymbolicLink(link, src)
        stage
      }
    val batchSchema = spark.read.parquet(src.toString).schema
    spark.readStream
      .schema(batchSchema)
      .parquet(sourceDir.toString)
  }

  /** Hourly tumbling-window counts per event type with a 2-hour
    * watermark: the streaming twin of the batch `q_events_hourly`.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** SLIDING-window counts — 2-hour windows advancing every hour, so
    * each event contributes to exactly two windows (the overlapping
    * trend view tumbling windows can't give: "events in the last 2h,
    * refreshed hourly"). State cost doubles with the overlap factor
    * (window-length / slide), still watermark-bounded.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "3 hours")
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:00:00").as("win_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Watermark-bounded streaming dedup by event_id (exactly-once-style
    * ingestion guard for at-least-once sources).
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases joined to the same user's
    * clicks within the preceding hour. Both sides are watermarked so the
    * join state is bounded — Spark buffers each side only until the
    * watermark passes the interval, the canonical pattern for
    * attribution joins over unbounded streams.
    */
  def purchaseClickJoin(spark: SparkSession, dir: String): DataFrame = {
    val purchases = readEvents(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
              col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", "2 hours")
    val clicks = readEvents(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("value").as("click_value"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(
      clicks,
      expr("""p_user = c_user AND
              c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"""),
      "inner")
      .select(
        col("p_user").as("user_id"), col("purchase_id"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts"),
        col("purchase_value"),
        date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("c_ts"),
        col("click_value"))
  }

  /** Stream-static join: the event stream enriched against the (batch)
    * customer dimension, then daily windowed aggregates per market
    * segment. The static side re-plans per micro-batch and broadcasts
    * under the join threshold — no state is kept for it, so the pattern
    * scales to arbitrarily long streams with a fixed-size dim.
    */
  def segmentDailyCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = readEvents(spark, dir).withWatermark("ts", "1 day")
    val dim = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    ev.join(dim, ev("user_id") === dim("c_custkey"))
      .groupBy(window(col("ts"), "1 day").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("c_mktsegment").as("segment"), col("cnt"), col("sum_value"))
  }

  /** Run a streaming frame to completion over the data currently present
    * (`availableNow`) into a memory sink, returning the final table as a
    * batch DataFrame. Used by the gate: streaming results must equal the
    * batch oracle.
    */
  def runToCompletion(
      spark: SparkSession,
      streamed: DataFrame,
      outputMode: String = "complete"): DataFrame = {
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // Stateful operators inherit spark.sql.shuffle.partitions as their
    // state-store partition count, and every micro-batch pays a state
    // commit PER PARTITION. Gate/bench state is tiny (thousands of
    // keys), so 32 partitions are pure commit overhead — pin a smaller
    // count for the stream's lifetime. At real scale this is the same
    // dial, sized to key cardinality instead.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = streamed.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        q.awaitTermination()
      } finally {
        if (q.isActive) q.stop()
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    spark.table(name)
  }
}
