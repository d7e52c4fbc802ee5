package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** A/B harness for connectedComponents round materialization
  * (NOTES_r3 candidate #2): eager localCheckpoint vs LogicalRDD +
  * persist/unpersist. Interleaved reps (A,B,A,B,…) so a host noise
  * burst can't bias one arm. Usage: `ProfileCluster <sfDir> [reps]`.
  */
object ProfileCluster {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def edgesAndNodes(): (DataFrame, DataFrame) = {
      val docs = Tables.documents(spark, d)
      val toks = docs.select(
        col("source").as("src_a"), col("doc_id").as("a"),
        TextFunctions.distinctTokens(col("text")).as("ta"))
      val cand = toks
        .withColumn("b", explode(sequence(col("a") + 1, col("a") + 20)))
      val right = docs.select(
        col("source").as("src_b"), col("doc_id").as("b"),
        TextFunctions.distinctTokens(col("text")).as("tb"))
      val edges = cand.join(right, "b")
        .filter(col("src_a") === col("src_b"))
        .filter(Dedup.jaccardTokens(col("ta"), col("tb")) > 0.5)
        .select(col("a"), col("b"))
      (edges, docs.select(col("doc_id").as("id")))
    }

    def run(usePersist: Boolean): (Double, Long) = {
      val (edges, nodes) = edgesAndNodes()
      val t0 = System.nanoTime()
      val labels = Dedup.connectedComponents(nodes, edges, usePersist = usePersist)
      val n = labels.agg(sum(col("label"))).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      labels.unpersist(blocking = false)
      (sec, n)
    }

    run(usePersist = false) // warm both paths' codegen/scan
    run(usePersist = true)
    (1 to reps).foreach { i =>
      val (ta, na) = run(usePersist = false)
      val (tb, nb) = run(usePersist = true)
      require(na == nb, s"label sums differ: $na vs $nb")
      println(f"it$i  checkpoint $ta%6.2f s   persist $tb%6.2f s")
    }
    spark.stop()
  }
}
