package graft
import org.apache.spark.sql.SparkSession

/** Print a registered query's formatted physical plan without
  * executing it — the judge-style `.explain("formatted")` audit as a
  * command: `runMain graft.ProfilePlanDump <sfDir> <queryName>`.
  * Dev-only instrument (PlanSpec pins the invariants; this is the
  * eyeball tool for finding the next one).
  */
object ProfilePlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
