package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access (TESTDATA.md): one parquet per table under the
  * scale-factor dir the driver passes in. Kept as a thin, lazy scan so
  * Catalyst sees the parquet relation directly (predicate pushdown /
  * column pruning reach the scan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts normalization, tolerant of the physical type drifting
    * across testdata generations:
    *  - INT64 TIMESTAMP(NANOS) → admitted only as long (nanosAsLong);
    *    normalize to micros with *integer* division — epoch nanos
    *    (~1.7e18) exceed 2^53, so a double-typed `/` would lose precision.
    *  - TIMESTAMP_NTZ (isAdjustedToUTC=false micros) → cast to session-TZ
    *    TimestampType. Sessions pin UTC, so the wall-clock instant is
    *    unchanged; LTZ is required by event-time watermarks downstream.
    */
  private[graft] def withEventTime(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = withEventTime(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` entry points work
    * (the reference's fourth surface, SURVEY.md §3 "musemotion-queries.sql").
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
