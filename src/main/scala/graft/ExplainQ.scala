package graft
import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan for one gate query:
  * `runMain graft.ExplainQ <sfDir> <name>`.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
