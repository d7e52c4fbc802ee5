package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions

/** Scratch stage-profiler for the q_dedup_minhash_10x gate: times each
  * stage of the pipeline over the STAGED 10x corpus (the same parquet
  * the gate reads), so the split between signature pass, bucket join,
  * estimate filter, exact verify, and the gate's fingerprint-overlay
  * joins is visible. Usage: tools/run.sh graft.ProfileMinhash10x
  * /tmp/graft_states_root/mh10x_<hash>__root_testdata_sf0_1 [iters]
  */
object ProfileMinhash10x {
  def main(args: Array[String]): Unit = {
    val corpusPath = args(0)
    val iters = if (args.length > 1) args(1).toInt else 2
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to iters).foreach { it =>
      println(s"--- iteration $it ---")
      val corpus = spark.read.parquet(corpusPath)
      time("corpus scan (noop)")(noop(corpus))
      // signature pass alone
      val sigsRaw = Dedup.signatures(corpus, "doc_id", "text", 5, 64)
      time("signatures (noop, uncached)")(noop(sigsRaw))
      // pipeline stages as the operator runs them
      val sigs = Dedup.signatures(corpus, "doc_id", "text", 5, 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("signatures materialize (count)")(sigs.count())
      val pairs = Dedup.lshCandidatePairsFromSigs(sigs, 64, maxBucket = 200)
      val nPairs = time("candidate pairs (count)")(pairs.count())
      println(s"  candidate pairs: $nPairs")
      val estimated = pairs
        .join(sigs.select(col("id").as("a"), col("sig").as("sa")), "a")
        .join(sigs.select(col("id").as("b"), col("sig").as("sb")), "b")
        .withColumn("est", Dedup.signatureSimilarity(col("sa"), col("sb")))
        .filter(col("est") >= 0.75)
        .select(col("a"), col("b"))
      val nEst = time("estimate filter (count)")(estimated.count())
      println(s"  estimated survivors: $nEst")
      val toks = corpus.select(col("doc_id").as("id"),
        TextFunctions.distinctTokens(col("text")).as("toks"))
      val da = toks.select(col("id").as("a"), col("toks").as("ta"))
      val db = toks.select(col("id").as("b"), col("toks").as("tb"))
      val verified = estimated.join(da, "a").join(db, "b")
        .withColumn("jaccard", Dedup.jaccardTokens(col("ta"), col("tb")))
        .filter(col("jaccard") >= 0.9)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
      time("exact verify (noop)")(noop(verified))
      sigs.unpersist(blocking = true)
      // the full operator end-to-end (its own fresh cache), then the
      // gate overlay (fps + eligible joins + final agg)
      val opPairs = Dedup.nearDuplicatePairs(corpus, minJaccard = 0.9)
      time("nearDuplicatePairs e2e (noop)")(noop(opPairs))
      val fps = corpus.select(col("doc_id"), md5(col("text")).as("fp"),
        (length(col("text")) > 0).as("nonempty"))
      val eligible = fps.groupBy("fp")
        .agg(count(lit(1)).as("k"), min(col("nonempty")).as("ne"))
        .filter(col("k") <= 200 && col("ne"))
        .select(col("fp"))
      val gate = Dedup.nearDuplicatePairs(corpus, minJaccard = 0.9)
        .join(fps.select(col("doc_id").as("a"), col("fp").as("fa")), "a")
        .join(fps.select(col("doc_id").as("b"), col("fp").as("fb")), "b")
        .filter(col("fa") === col("fb"))
        .join(eligible.select(col("fp").as("fa")), "fa")
        .agg(count(lit(1)).as("n_exact_pairs"),
             (min(col("jaccard")) === 1.0).as("exact_jac_ok"))
      time("full gate (consume)")(gate.collect().foreach(_ => ()))
    }
    spark.stop()
  }
}
