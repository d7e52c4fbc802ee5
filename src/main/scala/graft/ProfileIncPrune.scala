package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B for the incremental joins' Bloom prunes (r14): A =
  * bloomItems = 1M (the default), B = bloomItems = 0 (disabled). The
  * prune is ADAPTIVE on the broadcast threshold, so in the default
  * regime A ≈ B is the EXPECTED reading (the adaptive gate turns the
  * Bloom off where it cannot pay); in the forced-shuffle regime
  * (threshold −1 = the at-scale shape) the adaptive gate engages and
  * A vs B is the prune's exchange saving. Reports wall + shuffle
  * bytes/records + steal.
  * Corpora = the q_incremental_setsim / q_incremental_containment
  * gate constructions at the given SF.
  * Usage: `ProfileIncPrune <sfDir> [pairs]`. Dev-only instrument.
  */
object ProfileIncPrune {

  private class ShuffleMeter extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val records = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    def reset(): Unit = { bytes.set(0L); records.set(0L) }
  }

  private def steal(): Long =
    scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).map(_.split("\\s+")(8).toLong).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val pairs = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    def shingled(df: DataFrame) = df
      .repartition(2 * spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"),
        transform(sequence(lit(1), size(col("tk")) - 4),
          g => conv(substring(md5(concat_ws(" ",
            slice(col("tk"), g, lit(5)))), 1, 15), 16, 10).cast("long"))
          .as("shingles"))
    val base = Tables.documents(spark, d).select(col("doc_id"), col("text"))

    // stored state once per operator (the gates' constructions)
    val jPath = java.nio.file.Files.createTempDirectory("incj").toString
    graft.operators.SetSimJoin.saveSets(shingled(base), "doc_id",
      "shingles", jPath)
    val jBatch = shingled(base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "nearmark").as("text")))
      .localCheckpoint(true)
    val cPath = java.nio.file.Files.createTempDirectory("incc").toString
    graft.operators.SetSimJoin.saveSets(shingled(base), "doc_id",
      "shingles", cPath)
    val cBatch = shingled(base.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 12)
      .select(col("doc_id"),
        concat_ws(" ", slice(col("tk"), lit(1),
          floor(size(col("tk")) / 2).cast("int"))).as("text")))
      .localCheckpoint(true)

    def run(op: String, which: String): Unit = {
      val items = if (which == "A") 1000000L else 0L
      meter.reset()
      val s0 = steal()
      val t0 = System.nanoTime()
      val n = (if (op == "jac")
        graft.operators.SetSimJoin.incrementalJaccardPairs(spark, jPath,
          jBatch, "doc_id", "shingles", 0.8, bloomItems = items)
      else
        graft.operators.SetSimJoin.incrementalContainmentPairs(spark, cPath,
          cBatch, "doc_id", "shingles", 0.9, bloomItems = items)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$op%4s $which $sec%7.2f s  rows=$n%5d " +
        f"shuffleMB=${meter.bytes.get / 1048576.0}%7.1f " +
        f"shuffleRecords=${meter.records.get}%d " +
        f"stealTicks=${steal() - s0}%d")
    }
    Seq("jac", "con").foreach { op =>
      run(op, "A"); run(op, "B")
      println(s"-- $op interleaved (default plan regime) --")
      (1 to pairs).foreach { _ => run(op, "A"); run(op, "B") }
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    Seq("jac", "con").foreach { op =>
      println(s"-- $op interleaved (forced shuffle: the at-scale shape) --")
      (1 to pairs).foreach { _ => run(op, "A"); run(op, "B") }
    }
    spark.stop()
  }
}
