package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B for the containment-join container-side prune (r13
  * verdict item #1): variant A = the shipped plan (Bloom prune,
  * ADAPTIVE on the broadcast threshold — engaged only in the
  * forced-shuffle regime below); variant B = the r13 unpruned shape
  * (full inverted index into the candidate join), reproduced inline. Reports per-rep wall + /proc/stat steal
  * ticks + total shuffle-write bytes (the ProfileSetSim meter) and the
  * container-side instance-row count before/after the prune.
  * Usage: `ProfileContainAB <sfDir> [pairs]`. Dev-only instrument.
  */
object ProfileContainAB {

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

  /** The r13 shape: the container side joins unpruned. */
  private def containmentPairsOld(docs: DataFrame, idCol: String,
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
    val pref = ranked.select(col("sid"), col("n"),
      posexplode(slice(col("stoks"), lit(1),
        (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
          .cast("int"))).as(Seq("pos", "tok")))
    val full = ranked.select(col("sid"), col("n"),
      posexplode(col("stoks")).as(Seq("pos", "tok")))
    val chk = pref.join(dfreq, Seq("tok"))
      .agg(max_by(struct(col("tok"), col("df")), col("df")).as("w"))
      .select(
        when(coalesce(col("w.df"), lit(0L)) > maxBucket,
          raise_error(lit("maxBucket"))).otherwise(lit(1)).as("guard_ok"))
    val a = pref.select(col("tok"), col("sid").as("a"),
      col("n").as("na"), col("pos").as("pa"))
    val b = full.select(col("tok"), col("sid").as("b"),
      col("n").as("nb"), col("pos").as("pb"))
    val alpha = ceil(lit(threshold) * col("na") - lit(1e-9))
    val candIds = a.join(b, Seq("tok")).filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(min(col("pa")).as("pa"), min(col("pb")).as("pb"))
      .filter(col("nb") >= alpha &&
        least(col("na") - col("pa"), col("nb") - col("pb")) >= alpha)
      .select(col("a"), col("b"), col("na"))
    val cand = candIds
      .join(ranked.select(col("sid").as("a"), col("stoks").as("ta")), Seq("a"))
      .join(ranked.select(col("sid").as("b"), col("stoks").as("tb")), Seq("b"))
      .crossJoin(broadcast(chk))
    cand.select(col("a"), col("b"), col("na"),
        (size(array_intersect(col("ta"), col("tb"))).cast("long") *
          col("guard_ok").cast("long")).as("inter"))
      .select(col("a"), col("b"), col("inter"),
        round(col("inter") / col("na").cast("double"), 6).as("containment"))
      .filter(col("containment") >= threshold)
  }

  private def steal(): Long =
    scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).map(_.split("\\s+")(8).toLong).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val pairs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    // the q_containment_join gate corpus: every 20th doc's first half
    // planted under a new id, 5-token md5 shingles as longs
    def sh(): DataFrame = {
      val base = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      val halves = base.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= 12)
        .select(col("doc_id"),
          concat_ws(" ", slice(col("tk"), lit(1),
            floor(size(col("tk")) / 2).cast("int"))).as("text"))
      base.unionByName(halves)
        .repartition(2 * spark.sparkContext.defaultParallelism)
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
      meter.reset()
      val s0 = steal()
      val t0 = System.nanoTime()
      val n = (if (which == "A")
        graft.operators.SetSimJoin.containmentPairs(sh(), "doc_id",
          "shingles", 0.9)
      else containmentPairsOld(sh(), "doc_id", "shingles", 0.9)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$which $sec%7.2f s  rows=$n%5d " +
        f"shuffleMB=${meter.bytes.get / 1048576.0}%7.1f " +
        f"shuffleRecords=${meter.records.get}%d " +
        f"stealTicks=${steal() - s0}%d")
    }
    // warm both variants once, then interleave
    run("A"); run("B")
    println("-- interleaved (default: prefix side broadcasts) --")
    (1 to pairs).foreach { _ => run("A"); run("B") }
    // The at-scale regime: a real corpus' prefix frame exceeds any
    // broadcast threshold, so the candidate join becomes a shuffle
    // join and the container-side exchange appears. Forcing the
    // threshold off reproduces that plan shape at gate scale — this is
    // where the Bloom prune's shuffle-write reduction is measurable.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    println("-- interleaved (forced shuffle join: the at-scale shape) --")
    (1 to pairs).foreach { _ => run("A"); run("B") }
    spark.stop()
  }
}
