package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Opq, Pq, Similarity}

/** Rotation-gain measurement on the FULL-RANK anisotropic fixture
  * (Tables.anisotropicEmbeddings): plain ADC recall with NO rotation vs
  * Givens vs a TRAINED rotation — the separation a rotation-sensitive
  * gate needs (VERDICT r14 #4: the clustered fixture's tie groups made
  * ADC recall rotation-blind). Runs each variant `reps` times to see
  * Lloyd's run-to-run spread before a gate margin is pinned.
  * Usage: `ProfileOpqGain <sfDir> [reps]`. Dev-only.
  */
object ProfileOpqGain {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val fixture = if (args.length > 2) args(2) else "aniso"
    val residual = fixture != "spectral"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rho = if (args.length > 3) args(3).toDouble else 0.9
    val c = (fixture match {
      case "spectral" => Tables.spectralEmbeddings(spark, d, rho = rho)
      case "clustered" => Tables.clusteredEmbeddings(spark, d)
      case _ => Tables.anisotropicEmbeddings(spark, d)
    }).localCheckpoint(true)
    val qs = c.filter(col("vec_id") % 25 === 11 && col("vec_id") < 1000)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .localCheckpoint(true)
    println(s"corpus=${c.count()} queries=${qs.count()}")
    val exact = Similarity.bruteForceTopK(c, qs, k = 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val dim = 64
    def identity = Seq.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val rNone = recallOf(Pq.ivfPqTopK(c, qs, k = 5, nCells = 16,
        nProbe = 16, m = 16, ksub = 16, trainIters = 3, residual = residual))
      val rId = recallOf(Opq.opqTopK(c, qs, identity, k = 5, nCells = 16,
        nProbe = 16, m = 16, ksub = 16, trainIters = 3, residual = residual))
      val rGivens = recallOf(Opq.opqTopK(c, qs, Opq.givensRotation(dim),
        k = 5, nCells = 16, nProbe = 16, m = 16, ksub = 16, trainIters = 3,
        residual = residual))
      val (rt, _, hist) = Opq.opqTrain(c, m = 16, ksub = 16,
        outerIters = 2, lloydIters = 2)
      val rTrained = recallOf(Opq.opqTopK(c, qs, rt, k = 5, nCells = 16,
        nProbe = 16, m = 16, ksub = 16, trainIters = 3, residual = residual))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"rep $rep: none=$rNone%.3f identity=$rId%.3f " +
        f"givens=$rGivens%.3f trained=$rTrained%.3f " +
        f"(qerr ${hist.head}%.2f -> ${hist.last}%.2f, $sec%.0f s)")
    }
    spark.stop()
  }
}
