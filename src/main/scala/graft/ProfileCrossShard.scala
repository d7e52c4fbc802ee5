package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch stage-profiler for q_dedup_cross_shard: times the planted
  * corpus synthesis, the full crossShardDedupClusters call, each CC
  * invocation in isolation, and the gate overlay. Usage:
  * `tools/run.sh graft.ProfileCrossShard <sfDir> [iters]`.
  */
object ProfileCrossShard {
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
      // the gate's real shape carries source; rebuild it faithfully
      val base = Tables.documents(spark, d)
        .select(col("doc_id"), col("text"), col("source"))
      val plantedSharded = base.unionByName(
        base.select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
          col("source")))
        .unionByName(base.select((col("doc_id") + 2000000L).as("doc_id"),
          col("text"), lit("offsite").as("source")))
      val clusters = time("crossShardDedupClusters (e2e)") {
        val c = Dedup.crossShardDedupClusters(plantedSharded,
          minJaccard = 0.9, shardCols = Seq("source"))
        c.write.format("noop").mode("overwrite").save(); c
      }
      time("gate overlay + agg (consume)") {
        val withFp = plantedSharded
          .filter(size(graft.functions.TextFunctions.tokens(col("text"))) > 0)
          .select(col("doc_id").as("id"), col("source"),
            graft.functions.TextFunctions.exactFingerprint(col("text"))
              .as("fp"))
          .join(clusters, "id")
        val groups = withFp.groupBy("fp").agg(
          countDistinct(col("source")).as("ns"),
          countDistinct(col("cluster")).as("nc"))
        val out = groups.agg(
          count(lit(1)).as("n_groups"),
          sum(when(col("ns") >= 2, 1L).otherwise(0L)).as("n_cross_groups"),
          sum(when(col("ns") >= 2 && col("nc") === 1, 1L).otherwise(0L))
            .as("n_cross_intact"),
          (sum(when(col("nc") === 1, 1L).otherwise(0L)) === count(lit(1)))
            .as("all_intact"))
        BenchAction.consumeAll(out)
      }
      // CC in isolation on the within-shard pair graph
      val pairs = Dedup.nearDuplicatePairs(plantedSharded, minJaccard = 0.9,
        shardCols = Seq("source"))
      val nodes = plantedSharded.select(col("doc_id").as("id"))
      time("nearDuplicatePairs shard (noop)")(
        pairs.write.format("noop").mode("overwrite").save())
      time("connectedComponents (e2e)") {
        val labels = Dedup.connectedComponents(nodes, pairs,
          nodesCount = Some(15000L))
        labels.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
