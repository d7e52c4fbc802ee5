package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Scratch stage-profiler for q_llm_data_pipeline: mirrors the gate
  * body and times each materialization boundary, so the wall splits
  * into quality-cut, corpus build + line-dedup cut, exact dedup +
  * near-dup + anti-join cut, DSIR + select, and packing + sort.
  * Usage: `tools/run.sh graft.ProfileLlmStages <sfDir> [iters]`.
  */
object ProfileLlmStages {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def steal(): Long =
      try scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).map(_.split("\\s+")(8).toLong)
        .getOrElse(0L)
      catch { case _: Throwable => 0L }
    def time[T](label: String)(f: => T): T = {
      val s0 = steal(); val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  steal=${steal() - s0}"); r
    }

    (1 to iters).foreach { it =>
      println(s"--- iteration $it ---")
      val base = time("qualityDocs cut") {
        val b = graft.plans.Lineage.cut(Tables.documents(spark, d)
          .withColumn("toks", TextFunctions.tokens(col("text")))
          .withColumn("quality",
            TextFunctions.qualityScoreTokens(col("toks"), col("text"))))
          .filter(size(col("toks")) >= 1 && col("quality") >= 0.3)
        b.write.format("noop").mode("overwrite").save(); b
      }
      val nChunks = ceil(size(col("toks")).cast("double") / 10.0).cast("int")
      def builtWith(sep: String) = array_join(concat(
        array(lit("shared boilerplate header")),
        transform(sequence(lit(0), nChunks - 1),
          g => concat_ws(sep, slice(col("toks"), g * 10 + 1, lit(10)))),
        array(concat(lit("footer for "), col("source")))), "\n")
      val orig = base.select(col("doc_id"), col("source"),
        builtWith(" ").as("text"))
      val corpus = orig
        .unionByName(base.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
            builtWith(" ").as("text")))
        .unionByName(base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("source"),
            builtWith("  ").as("text")))
      val cleaned = time("line-dedup + cleaned cut") {
        val c = graft.operators.LineDedup
          .dropCommonLines(corpus, "doc_id", "text", minDocFreq = 5L)
          .join(corpus.select("doc_id", "source"), Seq("doc_id"))
          .select(col("doc_id"), col("source"), col("clean_text"),
            TextFunctions.tokens(col("clean_text")).as("ctoks"))
          .transform(graft.plans.Lineage.cut(_))
          .filter(size(col("ctoks")) >= 1)
        c.write.format("noop").mode("overwrite").save(); c
      }
      val afterExact = graft.operators.Dedup.dropDuplicatesByKey(
        cleaned, md5(col("clean_text")), "doc_id")
      val afterNear = time("exact+near dedup + cut") {
        val pairs = graft.operators.Dedup.nearDuplicatePairs(afterExact,
          minJaccard = 0.9, idCol = "doc_id", textCol = "clean_text")
        val fps = afterExact.select(col("doc_id"),
          TextFunctions.exactFingerprintTokens(col("ctoks")).as("fp"))
        val dropIds = pairs
          .join(fps.select(col("doc_id").as("a"), col("fp").as("fa")), "a")
          .join(fps.select(col("doc_id").as("b"), col("fp").as("fb")), "b")
          .filter(col("fa") === col("fb"))
          .select(col("b").as("doc_id")).distinct()
        val an = graft.plans.Lineage.cut(
          afterExact.join(dropIds, Seq("doc_id"), "left_anti"))
        an.write.format("noop").mode("overwrite").save(); an
      }
      val selected = time("DSIR weights + top-k") {
        val weights = graft.operators.Dsir.importanceWeights(
          raw = afterNear.select(col("doc_id"), col("ctoks").as("toks")),
          target = afterNear.filter(col("source").isin("src0", "src1"))
            .select(col("doc_id"), col("ctoks").as("toks")),
          idCol = "doc_id", toksCol = "toks", numBuckets = 1024)
        val sel = graft.operators.Dsir
          .resampleTopK(weights, "doc_id", "log_weight", k = 200)
          .select("doc_id")
        sel.write.format("noop").mode("overwrite").save(); sel
      }
      time("packing + sort (consume)") {
        val out = graft.operators.Packing.packFixedLength(
            afterNear.join(selected, Seq("doc_id"), "left_semi")
              .select(col("doc_id"), col("clean_text").as("text")),
            seqLen = 256L)
          .select(col("doc_id"), col("n_tokens"), col("g_start"),
            col("first_seq"), col("last_seq"),
            (col("last_seq") - col("first_seq") + 1).as("n_seqs"))
          .orderBy(asc("doc_id"))
        BenchAction.consumeAll(out)
      }
    }
    spark.stop()
  }
}
