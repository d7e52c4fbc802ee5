package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions

/** Scratch stage-profiler for the minhash near-dup pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val docs = docs0.unionByName(
      docs0.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    (1 to 2).foreach { it =>
      println(s"--- iteration $it ---")
      time("docs.count")(docs.count())
      time("tokens explode count")(
        docs.select(explode(TextFunctions.tokens(col("text")))).count())
      time("shingle explode count")(
        docs.select(explode(Dedup.shingles(col("text"), 5))).count())
      time("shingle-hash explode count")(
        docs.select(Dedup.tokenHashes(col("text")).as("th"))
          .select(explode(Dedup.shingleHashesFromTokenHashes(col("th"), 5)))
          .count())
      // the two signature forms, head to head: the compiled per-row
      // expression (zero shuffle — what signatures() now is) vs the
      // explode+agg pipeline it replaced
      time("signaturesAgg (explode+agg)")(
        Dedup.signaturesAgg(docs, "doc_id", "text", 5, 64).count())
      time("signatures (expression)")(
        Dedup.signatures(docs, "doc_id", "text", 5, 64).count())
      val sigs = Dedup.signatures(docs, "doc_id", "text", 5, 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("signatures materialize")(sigs.count())
      val pairs = Dedup.lshCandidatePairsFromSigs(sigs, 64)
      time("candidate pairs")(pairs.count())
      val estimated = pairs
        .join(sigs.select(col("id").as("a"), col("sig").as("sa")), "a")
        .join(sigs.select(col("id").as("b"), col("sig").as("sb")), "b")
        .withColumn("est", Dedup.signatureSimilarity(col("sa"), col("sb")))
        .filter(col("est") >= 0.75)
        .select(col("a"), col("b"))
      time("estimate filter")(estimated.count())
      val da = docs.select(col("doc_id").as("a"), col("text").as("ta"))
      val db = docs.select(col("doc_id").as("b"), col("text").as("tb"))
      val full = estimated.join(da, "a").join(db, "b")
        .withColumn("jaccard", Dedup.jaccard(col("ta"), col("tb")))
        .filter(col("jaccard") >= 0.9)
      time("verify join")(full.count())
      sigs.unpersist()
    }
    spark.stop()
  }
}
