package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B for the SetSimJoin candidate-generation rewrite
  * (r12 verdict item #1): variant A = the shipped id-only + positional
  * filter plan; variant B = the r12 array-carrying prefix explode,
  * reproduced inline. Alternating reps in one JVM cancel host drift
  * (steal bursts, JIT, cleaner churn) that serial timing can't.
  * Usage: `ProfileSetSimAB <sfDir> [pairs]`. Dev-only instrument.
  */
object ProfileSetSimAB {

  /** The r12 shape: prefix rows carry the full sorted array. */
  private def jaccardPairsOld(docs: DataFrame, idCol: String,
                              toksCol: String, threshold: Double,
                              maxBucket: Int = 10000): DataFrame = {
    val sets = graft.plans.Lineage.cut(
      docs.select(col(idCol).as("sid"),
        array_distinct(col(toksCol)).as("set"))
      .filter(size(col("set")) >= 1))
    val inst = sets.select(col("sid"), explode(col("set")).as("tok"))
    val dfreq = inst.groupBy("tok").agg(count(lit(1)).as("df"))
    val ranked = graft.plans.Lineage.cut(
      inst.join(dfreq, Seq("tok"))
        .groupBy("sid")
        .agg(transform(array_sort(collect_list(struct(col("df"), col("tok")))),
          x => x.getField("tok")).as("stoks"))
        .select(col("sid"), col("stoks"), size(col("stoks")).as("n")))
    val withPrefix = ranked.select(col("sid"), col("stoks"), col("n"),
      slice(col("stoks"), lit(1),
        (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
          .cast("int")).as("prefix"))
    val pref = withPrefix.select(col("sid"), col("stoks"), col("n"),
      explode(col("prefix")).as("tok"))
    val chk = pref.groupBy("tok").agg(count(lit(1)).as("c"))
      .agg(max_by(struct(col("tok"), col("c")), col("c")).as("w"))
      .select(
        when(coalesce(col("w.c"), lit(0L)) > maxBucket,
          raise_error(lit("maxBucket"))).otherwise(lit(1)).as("guard_ok"))
    val a = pref.select(col("tok"), col("sid").as("a"),
      col("stoks").as("ta"), col("n").as("na"))
    val b = pref.select(col("tok"), col("sid").as("b"),
      col("stoks").as("tb"), col("n").as("nb"))
    val cand = a.join(b, Seq("tok")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("ta"), col("tb"),
        col("na"), col("nb"))
      .dropDuplicates("a", "b")
      .crossJoin(broadcast(chk))
    cand.select(col("a"), col("b"), col("na"), col("nb"),
        (size(array_intersect(col("ta"), col("tb"))).cast("long") *
          col("guard_ok").cast("long")).as("inter"))
      .select(col("a"), col("b"), col("inter"),
        round(col("inter") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  private def steal(): Long =
    scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).map(_.split("\\s+")(8).toLong).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val pairs = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the q_setsim_join gate corpus, hashed-long shingles
    def sh(): DataFrame = {
      val base = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      val corpus = base.unionByName(
        base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            regexp_replace(col("text"), "^\\S+", "nearmark").as("text")))
      corpus.repartition(2 * spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= 5)
        .select(col("doc_id"),
          transform(sequence(lit(1), size(col("tk")) - 4),
            g => conv(substring(md5(concat_ws(" ",
              slice(col("tk"), g, lit(5)))), 1, 15), 16, 10).cast("long"))
            .as("shingles"))
    }

    def run(which: String): Unit = {
      val s0 = steal()
      val t0 = System.nanoTime()
      val n = (if (which == "A")
        graft.operators.SetSimJoin.jaccardPairs(sh(), "doc_id", "shingles", 0.8)
      else jaccardPairsOld(sh(), "doc_id", "shingles", 0.8)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$which $sec%7.2f s  rows=$n%5d stealTicks=${steal() - s0}%d")
    }
    // warm both variants once, then interleave
    run("A"); run("B")
    println("-- interleaved --")
    (1 to pairs).foreach { _ => run("A"); run("B") }
    spark.stop()
  }
}
