package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Shard-skew A/B for the windowed (per-shard) minhash pipeline.
  *
  * The shard-bounded cost claim (Dedup.lshCandidatePairsFromSigs: shard
  * keys join into the bucket key, so every bucket join is bounded by
  * shard size) is plan-true but degrades as one shard absorbs the
  * corpus: at 100% skew the "windowed" pass IS the one-pass pipeline.
  * This profiler times the same planted corpus under three layouts —
  * balanced (the native 20-way source split), skewed (90% of rows
  * rerouted into one mega shard), degenerate (a single shard) — with
  * interleaved reps so a host-noise burst can't bias one arm. The
  * maxBucket guard is the backstop either way: bucket joins stay
  * ≤ maxBucket² rows per bucket no matter how large a shard gets, at
  * the documented recall cost of dropping oversized (boilerplate)
  * buckets. Results recorded in BASELINE.md (round 7).
  */
object ProfileShardSkew {
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

    // same planted 3x corpus as q_dedup_minhash_sharded
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("source"))
    val planted = docs.unionByName(
        docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
                    col("source")))
      .unionByName(docs.select((col("doc_id") + 2000000L).as("doc_id"),
                    col("text"), lit("offsite").as("source")))

    val balanced = planted
    val skewed = planted.withColumn("source",
      when(pmod(xxhash64(col("doc_id")), lit(10)) < 9, lit("mega"))
        .otherwise(col("source")))
    val degenerate = planted.withColumn("source", lit("all"))

    def run(corpus: DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = BenchAction.consumeAll(
        Dedup.nearDuplicatePairs(corpus, minJaccard = 0.9,
          shardCols = Seq("source")))
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val arms = Seq("balanced" -> balanced, "skew90" -> skewed,
                   "degenerate" -> degenerate)
    arms.foreach { case (label, c) => run(c); () } // warm-up pass
    (1 to reps).foreach { it =>
      arms.foreach { case (label, c) =>
        val (sec, n) = run(c)
        println(f"$label%-12s it$it $sec%8.2f s  pairs=$n")
      }
    }
    spark.stop()
  }
}
