package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-state scale instrument: drive the stateful dedup
  * (`dropDuplicatesWithinWatermark`) to N million LIVE keys — every
  * event inside one watermark window, so nothing evicts and the state
  * store must hold all N — under a constrained heap, comparing the
  * default (heap HashMap) provider against RocksDB.
  *
  * `runMain graft.ProfileStreamState <nKeys> <hdfs|rocksdb>` with
  * `GRAFT_XMX` as the heap lever. The claim under test (SCALING.md §6):
  * with RocksDB the state lives off-heap/on-disk, so per-executor state
  * is bounded by disk, not heap — the difference between a streaming
  * dedup that dies at tens of millions of keys per executor and one
  * that keeps going.
  */
object ProfileStreamState {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val provider = if (args.length > 1) args(1) else "rocksdb"
    val builder = SparkSession.builder().master("local[8]")
      // state-store partitions == shuffle partitions; 8 keeps per-batch
      // commit overhead sane while still exercising parallel stores
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
    if (provider == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = s"/tmp/graft_stream_state_input_$n"
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      // all timestamps within one hour → a 2-hour watermark never
      // evicts → live state == distinct keys == n
      spark.range(0, n)
        .select(col("id").as("event_id"),
          (lit(1700000000L) + (col("id") % 3600)).cast("timestamp").as("ts"))
        .repartition(32)
        .write.mode("overwrite").parquet(dir)
    }

    val schema = spark.read.parquet(dir).schema
    val t0 = System.nanoTime()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "8") // several batches → real commits
      .parquet(dir)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("noop")
      .option("checkpointLocation",
        s"/tmp/graft_stream_state_ckpt_${provider}_${n}_${System.nanoTime()}")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = q.recentProgress.map(p => p.sink.numOutputRows).sum
    val keys = q.recentProgress.lastOption
      .flatMap(p => Option(p.stateOperators).flatMap(_.headOption))
      .map(_.numRowsTotal).getOrElse(-1L)
    println(f"provider=$provider%-8s n=$n wall=${(System.nanoTime() - t0) / 1e9}%8.2f s out_rows=$rows state_keys=$keys")
    spark.stop()
  }
}
