package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prefix-filter effectiveness: candidate pairs the set-similarity join
  * actually examines vs the all-pairs count brute force would score,
  * plus result size — at the q_setsim_join corpus (5-token shingle
  * sets, every 10th doc cloned with one substitution).
  * Usage: `ProfileSetSim <sfDir> [threshold]`.
  */
object ProfileSetSim {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val t = if (args.length > 1) args(1).toDouble else 0.8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val corpus = base.unionByName(
      base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          regexp_replace(col("text"), "^\\S+", "nearmark").as("text")))
    val sh = corpus.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"),
        transform(sequence(lit(1), size(col("tk")) - 4),
          g => concat_ws(" ", slice(col("tk"), g, lit(5)))).as("shingles"))
      .persist()
    val nDocs = sh.count()
    val allPairs = nDocs * (nDocs - 1) / 2

    // replicate the operator's candidate stage to count it
    val sets = sh.select(col("doc_id").as("sid"),
      array_distinct(col("shingles")).as("set"))
    val inst = sets.select(col("sid"), explode(col("set")).as("tok"))
    val dfreq = inst.groupBy("tok").agg(count(lit(1)).as("df"))
    val ranked = inst.join(dfreq, Seq("tok"))
      .groupBy("sid")
      .agg(transform(array_sort(collect_list(struct(col("df"), col("tok")))),
        x => x.getField("tok")).as("stoks"))
      .select(col("sid"), col("stoks"), size(col("stoks")).as("n"))
    val pref = ranked.select(col("sid"),
      explode(slice(col("stoks"), lit(1),
        (col("n") - ceil(lit(t) * col("n") - lit(1e-9)) + 1).cast("int")))
        .as("tok"))
    val cands = pref.select(col("tok"), col("sid").as("a"))
      .join(pref.select(col("tok"), col("sid").as("b")), Seq("tok"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct().count()

    val t0 = System.nanoTime()
    val results = graft.operators.SetSimJoin
      .jaccardPairs(sh, "doc_id", "shingles", t).count()
    val sec = (System.nanoTime() - t0) / 1e9

    println(f"docs=$nDocs%d allPairs=$allPairs%d candidates=$cands%d " +
      f"(${cands * 100.0 / allPairs}%.4f%% of all pairs) " +
      f"results=$results%d joinSec=$sec%.2f")
    spark.stop()
  }
}
