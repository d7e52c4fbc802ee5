package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch stage-profiler for the simhash near-dup pipeline. */
object ProfileSimhash {
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
      val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
      time("signatures")(sigs.count())
      val packed = sigs.select(col("id"), Dedup.packBits(col("sig")).as("words"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("packed")(packed.count())
      val banded = packed.select(
        col("id"), posexplode(col("words")).as(Seq("band", "w")))
      val sizes = banded.groupBy("band", "w").agg(count(lit(1)).as("n"))
      time("bucket stats")(
        sizes.agg(max("n"), sum(col("n") * col("n"))).show())
      val l = banded.select(col("band"), col("w"), col("id").as("a"))
      val r = banded.select(col("band"), col("w"), col("id").as("b"))
      val pairs = l.join(r, Seq("band", "w")).filter(col("a") < col("b"))
      time("raw pairs count")(println("raw pairs: " + pairs.count()))
      val dp = pairs.select("a", "b").distinct()
      time("distinct pairs")(println("distinct: " + dp.count()))
      val verified = dp
        .join(packed.select(col("id").as("a"), col("words").as("wa")), "a")
        .join(packed.select(col("id").as("b"), col("words").as("wb")), "b")
        .withColumn("hamming", Dedup.hammingPacked(col("wa"), col("wb")))
        .filter(col("hamming") <= 3)
      time("verify")(verified.count())
      packed.unpersist()
    }
    spark.stop()
  }
}
