package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** AQE skew-join handling is the runtime complement to the static
  * [[SaltedJoin]]: when one key dominates a shuffle join, AQE splits
  * the oversized partition into sub-reads that join against replicated
  * build-side reads. This spec forces the situation (one hot key,
  * thresholds lowered to fire at test scale) and pins that the final
  * adaptive plan actually marked the join skewed — i.e. the dial we
  * rely on at 100 TB (SCALING.md §2) demonstrably engages.
  */
class SkewJoinAqeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AQE splits the hot-key partition (skew=true in final plan)") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fire at test scale: any partition >16KB and 2x median is skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      // force a shuffle join (no broadcast escape hatch)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // coalescing can mask the split at tiny sizes
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 80% of rows land on key 0, the rest spread over 49 keys. The
      // consumer is a GLOBAL aggregate — a per-key groupBy would reuse
      // the join's hash partitioning and AQE would (correctly) refuse
      // to split it without forceOptimizeSkewedJoin.
      val left = spark.range(0, 200000)
        .select(when(col("id") % 5 < 4, lit(0L)).otherwise(col("id") % 50)
          .as("k"), col("id").as("v"))
      val right = spark.range(0, 50)
        .select(col("id").as("k"), concat(lit("payload_"), col("id")).as("p"))
      val joined = left.join(right, "k").agg(count(lit(1)).as("n"))
      assert(joined.collect()(0).getLong(0) == 200000L)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
