package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Opq, Pq, Similarity}

/** Recall decomposition for the trained-OPQ end-to-end gate: plain
  * residual IVF-PQ vs +Givens vs +trained rotation, on the gate's own
  * queries/geometry. Usage: `ProfileOpqGate <sfDir>`. Dev-only.
  */
object ProfileOpqGate {
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
    val c = Tables.clusteredEmbeddings(spark, d).localCheckpoint(true)
    val qs = c.filter(col("vec_id") % 25 === 11 && col("vec_id") < 1000)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .localCheckpoint(true)
    val exact = Similarity.bruteForceTopK(c, qs, k = 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    def show(name: String, r: => Double): Unit =
      println(f"$name%-28s recall=${r}%.3f")
    show("raw residual (no rotation)", recallOf(Pq.ivfPqTopK(c, qs, k = 5,
      nCells = 16, nProbe = 4, m = 16, ksub = 16, trainIters = 3,
      residual = true)))
    show("givens rotation", recallOf(Opq.opqTopK(c, qs,
      Opq.givensRotation(64), k = 5, nCells = 16, nProbe = 4, m = 16,
      ksub = 16, trainIters = 3, residual = true)))
    val (r2, _, _) = Opq.opqTrain(c, m = 16, ksub = 16, outerIters = 2,
      lloydIters = 2)
    show("trained rotation", recallOf(Opq.opqTopK(c, qs, r2, k = 5,
      nCells = 16, nProbe = 4, m = 16, ksub = 16, trainIters = 3,
      residual = true)))
    show("rerank residual no-rot", recallOf(Pq.ivfPqRerank(c, qs, k = 5,
      shortlist = 50, nCells = 16, nProbe = 4, m = 16, ksub = 16,
      trainIters = 3, residual = true)))
    show("rerank shortlist=200", recallOf(Pq.ivfPqRerank(c, qs, k = 5,
      shortlist = 200, nCells = 16, nProbe = 4, m = 16, ksub = 16,
      trainIters = 3, residual = true)))
    spark.stop()
  }
}
