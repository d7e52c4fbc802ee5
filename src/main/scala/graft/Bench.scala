package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One warm-up pass amortizes JVM/codegen startup out of the numbers;
    // each headline is then timed end-to-end (plan + execute) TWICE and
    // the minimum reported — the environment is noisy across runs
    // (identical binaries have measured 2-3x apart; see BASELINE.md), and
    // min-of-reps is the standard way to estimate the real cost under
    // interference the query didn't cause.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val headlines = SparkEntry.headlines
    // BenchAction.consumeAll (not .count) so column pruning can't delete the
    // measured work — a projection-only headline timed via count() measures
    // a pruned scan, not the projection.
    headlines.foreach { q =>
      try BenchAction.consumeAll(q.fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    // Timed reps run as ROUND-ROBIN PASSES over the whole suite, not
    // back-to-back per query: the host shows multi-second CPU-steal bursts
    // (identical binaries measure 2-3x apart), and consecutive reps of one
    // query share the same burst. Separated-in-time reps make min-per-query
    // an estimate of the real cost rather than of the noise window.
    val times = collection.mutable.Map.empty[String, Double]
    val rows = collection.mutable.Map.empty[String, Long]
    (1 to reps).foreach { _ =>
      headlines.foreach { q =>
        val t0 = System.nanoTime()
        val n = try { BenchAction.consumeAll(q.fn(spark, sfDir)) } catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        times(q.name) = math.min(times.getOrElse(q.name, Double.MaxValue), sec)
        rows.getOrElseUpdate(q.name, n)
      }
    }
    val results = headlines.map(q => (q.name, times(q.name), rows(q.name)))
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // row counts catch silently-empty results that a pure timing line
    // would happily report as "fast"
    val rs = results.map { case (k, _, n) => s"\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
