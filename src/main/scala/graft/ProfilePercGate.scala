package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Scratch stage-profiler for the q_percolate_registry gate: splits the
  * gate's wall into shingle-cut, saveIndex, loadIndex, registry
  * derivation, compile, probe, and final sort — the same bodies the
  * gate runs. Usage: `tools/run.sh graft.ProfilePercGate <sfDir> [iters]`.
  */
object ProfilePercGate {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def steal(): Long =
      try scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).map(_.split("\\s+")(8).toLong)
        .getOrElse(0L)
      catch { case _: Throwable => 0L }
    def time[T](label: String)(f: => T): T = {
      val s0 = steal(); val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  steal=${steal() - s0}"); r
    }
    val path = java.nio.file.Files.createTempDirectory("perc_gate").toString

    (1 to iters).foreach { it =>
      println(s"--- iteration $it ---")
      val sh = time("shingle+cut") {
        graft.plans.Lineage.cut(Tables.documents(spark, d)
          .repartition(2 * spark.sparkContext.defaultParallelism)
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
          .select(col("doc_id"),
            when(size(col("tk")) >= 5,
              concat_ws(" ", transform(sequence(lit(1), size(col("tk")) - 4),
                g => substring(md5(concat_ws(" ", slice(col("tk"), g, lit(5)))),
                  1, 15)))).as("text")))
          .filter(col("text").isNotNull)
      }
      time("saveIndex")(graft.operators.Bm25.saveIndex(sh, path))
      // saveIndex internals, split (mirrors the r19 body: persisted tf
      // feeds postings, dfreq, and stats' sum_dl; dfreq/stats writes
      // overlap inside the real saveIndex — here timed separately)
      val tf0 = graft.operators.Bm25.termFrequencies(sh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("  tf compute (noop)")(
        tf0.write.format("noop").mode("overwrite").save())
      time("  postings write")(
        tf0.write.mode("overwrite").parquet(s"$path/_p_postings"))
      time("  dfreq from tf cache + write")(
        tf0.groupBy("tok").agg(count(lit(1)).as("df"))
          .write.mode("overwrite").parquet(s"$path/_p_dfreq"))
      time("  stats from tf cache + write")(
        sh.agg(count(lit(1)).as("n")).crossJoin(
            tf0.agg(coalesce(sum(col("tf")), lit(0L)).as("sum_dl")))
          .write.mode("overwrite").parquet(s"$path/_p_stats"))
      tf0.unpersist(blocking = false)
      val idx = time("loadIndex")(graft.operators.Bm25.loadIndex(spark, path))
      val reg = sh.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("query_id"),
          TextFunctions.tokens(col("text")).as("stk"))
        .filter(size(col("stk")) >= 8)
        .select(col("query_id"),
          concat_ws(" ", slice(col("stk"), 3, 6)).as("query_text"))
      val compiled = time("compilePercolateTable")(
        graft.operators.Bm25.compilePercolateTable(idx, reg))
      val out = time("percolateJoin+sort (consume)") {
        val df = graft.operators.Bm25
          .percolateJoin(sh, compiled, threshold = 5.0)
          .orderBy(asc("query_id"), asc("doc_id"))
        BenchAction.consumeAll(df)
      }
      println(s"  alerts: $out")
    }
    spark.stop()
  }
}
