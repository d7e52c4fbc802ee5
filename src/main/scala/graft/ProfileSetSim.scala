package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prefix-filter effectiveness: candidate pairs the set-similarity join
  * actually examines vs the all-pairs count brute force would score,
  * plus result size AND total shuffle write bytes for the join itself —
  * at the q_setsim_join corpus (5-token shingle sets, every 10th doc
  * cloned with one substitution). The shuffle-bytes reading is the A/B
  * instrument for candidate-generation rewrites (the r12 verdict's
  * prefix-explode array-replication finding).
  * Usage: `ProfileSetSim <sfDir> [threshold]`.
  */
object ProfileSetSim {

  /** Sums shuffle write bytes across all tasks between reset() calls. */
  private class ShuffleMeter extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val records = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    def reset(): Unit = { bytes.set(0L); records.set(0L) }
  }

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
    val pref = ranked.select(col("sid"), col("n"),
      posexplode(slice(col("stoks"), lit(1),
        (col("n") - ceil(lit(t) * col("n") - lit(1e-9)) + 1).cast("int")))
        .as(Seq("pos", "tok")))
    val rawPairs = pref.select(col("tok"), col("sid").as("a"),
        col("n").as("na"), col("pos").as("pa"))
      .join(pref.select(col("tok"), col("sid").as("b"),
        col("n").as("nb"), col("pos").as("pb")), Seq("tok"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(min(col("pa")).as("pa"), min(col("pb")).as("pb"))
      .persist()
    val cands = rawPairs.count()
    val posFiltered = rawPairs.filter(
      least(col("na") - col("pa"), col("nb") - col("pb")) >=
        ceil(lit(t / (1.0 + t)) * (col("na") + col("nb")) - lit(1e-9)))
      .count()

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    // warm once (codegen/JIT), then measure a clean run
    graft.operators.SetSimJoin
      .jaccardPairs(sh, "doc_id", "shingles", t).count()
    // drain straggling task-end events before resetting the meter
    // (the listener bus is async; its internals are private[spark])
    Thread.sleep(2000)
    meter.reset()
    val t0 = System.nanoTime()
    val results = graft.operators.SetSimJoin
      .jaccardPairs(sh, "doc_id", "shingles", t).count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000)

    println(f"docs=$nDocs%d allPairs=$allPairs%d candidates=$cands%d " +
      f"(${cands * 100.0 / allPairs}%.4f%% of all pairs) " +
      f"posFiltered=$posFiltered%d " +
      f"results=$results%d joinSec=$sec%.2f " +
      f"shuffleWriteMB=${meter.bytes.get / 1048576.0}%.1f " +
      f"shuffleRecords=${meter.records.get}%d")
    spark.stop()
  }
}
