package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Matryoshka-truncation recall curve: recall@k of prefix-dims exact
  * search (and of the prefix-shortlist + full-width re-rank) against
  * full-width brute force, per prefix width. Usage:
  * `ProfileMrl <sfDir> [k] [nQueries] [shortlist]`.
  */
object ProfileMrl {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val k = if (args.length > 1) args(1).toInt else 10
    val nq = if (args.length > 2) args(2).toInt else 50
    val shortlist = if (args.length > 3) args(3).toInt else 30
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, d)
    val queries = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

    def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val exact = neighborSets(Similarity.bruteForceTopK(emb, queries, k))
    def recall(got: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, e) =>
        got.getOrElse(q, Set.empty).intersect(e).size.toDouble / e.size }
      per.sum / per.size
    }

    println(f"dims  recall@$k%d(trunc)  recall@$k%d(rerank sl=$shortlist%d)")
    for (dims <- Seq(4, 8, 16, 32, 64)) {
      val rTrunc = recall(neighborSets(
        Similarity.mrlTopK(emb, queries, k, dims)))
      val rRerank = recall(neighborSets(
        Similarity.mrlRerankTopK(emb, queries, k, dims, shortlist)))
      println(f"$dims%4d  $rTrunc%.3f  $rRerank%.3f")
    }
    spark.stop()
  }
}
