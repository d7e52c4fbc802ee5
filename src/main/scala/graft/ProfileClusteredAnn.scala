package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** ANN recall on BOTH corpus shapes side by side — the isotropic
  * synthetic embeddings (the information-free floor documented in the
  * r12 BASELINE curves) and the clustered Tables-level fixture
  * ([[Tables.clusteredEmbeddings]]: 8 tight cells, rank-2 tail-masked
  * within-cluster variance — the trained-embedder regime). Mirrors the
  * r12 curve setups: IVF-PQ recall@10 over 2000 vectors / 50 queries at
  * nCells=16 trained 3 iters, raw vs residual vs rerank; MRL
  * recall-vs-width over 5000 vectors / 50 queries.
  * Usage: `ProfileClusteredAnn <sfDir>`. Dev-only instrument.
  */
object ProfileClusteredAnn {

  private def recallAt(exact: Set[(Long, Long)],
                       got: Set[(Long, Long)]): Double =
    if (exact.isEmpty) 0.0
    else (exact intersect got).size.toDouble / exact.size

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

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"),
          col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def ivfPqTable(corpus0: DataFrame, tag: String): Unit = {
      val corpus = corpus0.filter(col("vec_id") < 2000).persist()
      corpus.count()
      val queries = corpus.filter(col("vec_id") % 40 === 17).limit(50)
        .select(col("vec_id").as("query_id"),
                col("embedding").as("query_vec")).persist()
      queries.count()
      val exact = pairs(Similarity.bruteForceTopK(corpus, queries, k = 10))
      println(s"== IVF-PQ recall@10, $tag (2000 vecs, 50 queries, " +
        "nCells=16, 3 iters) ==")
      for ((m, ksub) <- Seq((8, 16), (16, 16), (16, 64), (32, 64))) {
        val raw = recallAt(exact, pairs(Pq.ivfPqTopK(corpus, queries,
          k = 10, nCells = 16, nProbe = 4, m = m, ksub = ksub,
          trainIters = 3)))
        val res = recallAt(exact, pairs(Pq.ivfPqTopK(corpus, queries,
          k = 10, nCells = 16, nProbe = 4, m = m, ksub = ksub,
          trainIters = 3, residual = true)))
        val rer = recallAt(exact, pairs(Pq.ivfPqRerank(corpus, queries,
          k = 10, shortlist = 50, nCells = 16, nProbe = 4, m = m,
          ksub = ksub, trainIters = 3, residual = true)))
        println(f"m=$m%-3d ksub=$ksub%-4d raw=$raw%.3f residual=$res%.3f " +
          f"rerank(sl=50)=$rer%.3f")
      }
      corpus.unpersist(); queries.unpersist()
    }

    def mrlTable(corpus0: DataFrame, tag: String): Unit = {
      val corpus = corpus0.filter(col("vec_id") < 5000).persist()
      corpus.count()
      val queries = corpus.filter(col("vec_id") % 100 === 17).limit(50)
        .select(col("vec_id").as("query_id"),
                col("embedding").as("query_vec")).persist()
      queries.count()
      val exact = pairs(Similarity.bruteForceTopK(corpus, queries, k = 10))
      println(s"== MRL recall@10 vs width, $tag (5000 vecs, 50 queries) ==")
      for (dims <- Seq(4, 8, 16, 32, 64)) {
        val tr = recallAt(exact, pairs(
          Similarity.mrlTopK(corpus, queries, k = 10, dims = dims)))
        val rr = recallAt(exact, pairs(
          Similarity.mrlRerankTopK(corpus, queries, k = 10, dims = dims,
            shortlist = 30)))
        println(f"dims=$dims%-3d trunc=$tr%.3f rerank(sl=30)=$rr%.3f")
      }
      corpus.unpersist(); queries.unpersist()
    }

    val iso = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    val clu = Tables.clusteredEmbeddings(spark, d)
    ivfPqTable(iso, "ISOTROPIC")
    ivfPqTable(clu, "CLUSTERED")
    mrlTable(iso, "ISOTROPIC")
    mrlTable(clu, "CLUSTERED")
    spark.stop()
  }
}
