package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.LinearClassifier

/** Scratch stage-profiler for q_linear_classify: feature-frame
  * materialization, per-iteration training cost, and the scoring pass.
  * Usage: `tools/run.sh graft.ProfileLinear <sfDir> [iters]`.
  */
object ProfileLinear {
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
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  steal=${steal() - s0}"); r
    }

    (1 to iters).foreach { it =>
      println(s"--- iteration $it ---")
      val planted = Tables.documents(spark, d).select(col("doc_id"),
        (col("doc_id") % 2).cast("int").as("y"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0, lit(" mk0 mk0"))
            .otherwise(lit(" mk1 mk1"))).as("text"))
      val t = planted.select(col("doc_id"), col("y"),
          TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 1)
      // feature frame alone (the prepared shape: explode + md5 + cut)
      time("features (noop, no cut)") {
        LinearClassifier.features(t, "doc_id", "toks", "y", 2048)
          .write.format("noop").mode("overwrite").save()
      }
      time("features repartition+ckpt+count") {
        LinearClassifier.features(t, "doc_id", "toks", "y", 2048)
          .repartition(col("doc_id")).localCheckpoint(false)
          .select(col("doc_id")).distinct().count()
      }
      time("train 2 iters") {
        LinearClassifier.train(t, "doc_id", "toks", "y",
          numBuckets = 2048, iters = 2, lr = 5.0)._1.count()
      }
      time("trainScoreBinary full (consume)") {
        BenchAction.consumeAll(
          LinearClassifier.trainScoreBinary(t, "doc_id", "toks", "y",
            numBuckets = 2048, iters = 2, lr = 5.0)
            .orderBy(asc("doc_id")))
      }
    }
    spark.stop()
  }
}
