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
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val headlines = SparkEntry.headlines
    headlines.foreach { q =>
      try q.fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val results = headlines.map { q =>
      val timed = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = try { q.fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      (q.name, timed.map(_._1).min, timed.head._2)
    }
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
