package graft
import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of every bench headline (or the
  * names given as trailing args) to `<outDir>/<name>_<suffix>.txt` in
  * ONE JVM — the before/after plan-artifact capture for optimization
  * rounds: `runMain graft.ProfilePlanDumpAll <sfDir> <outDir> <suffix>
  * [name ...]`. Dev-only instrument (ProfilePlanDump is the single-query
  * eyeball tool; this one exists so a 32-headline sweep is one session,
  * not 32 JVM launches).
  */
object ProfilePlanDumpAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.headlines.map(_.name)
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val out = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(out, plan.getBytes("UTF-8"))
        println(s"[plan-dump] wrote $out")
      } catch { case e: Throwable =>
        println(s"[plan-dump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
