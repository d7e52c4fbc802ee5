package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Cumulative hypervisor-steal ticks from /proc/stat (field 8 of the
    * aggregate `cpu` line). The round-13 adjudication instrument
    * (ProfileSetSimAB), folded into the bench itself: identical
    * binaries have measured 2-3× apart under neighbor bursts, and a
    * bench artifact without steal metadata cannot distinguish
    * regression from noise.
    */
  private def stealTicks(): Long =
    try scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).map(_.split("\\s+")(8).toLong)
      .getOrElse(0L)
    catch { case _: Throwable => 0L }

  /** Fixed deterministic CPU work (a 64-bit mix loop) whose wall time
    * calibrates the HOST, not the engine: steal ticks miss contention
    * that arrives as frequency scaling or SMT/cache-neighbor pressure
    * (observed: a 3× rep with only ~1.3k ticks), so the artifact
    * records an absolute same-work-every-round yardstick. Returns the
    * loop's final hash so the JIT cannot dead-code it.
    */
  private def mixLoop(iters: Long): Long = {
    var h = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < iters) {
      h ^= i; h *= 0xC2B2AE3D27D4EB4FL; h ^= (h >>> 29); i += 1
    }
    h
  }

  /** (min single-thread seconds, min all-core seconds) over `reps` runs
    * of the fixed mix loop — all-core wall on an otherwise-idle host
    * equals single-thread wall; neighbor pressure shows up as the
    * parallel number drifting above the single one.
    */
  private def cpuControl(iters: Long = 200000000L,
                         reps: Int = 3): (Double, Double) = {
    var sink = 0L
    def once(): Double = {
      val t0 = System.nanoTime()
      sink ^= mixLoop(iters)
      (System.nanoTime() - t0) / 1e9
    }
    val nThreads = Runtime.getRuntime.availableProcessors()
    def onceParallel(): Double = {
      val t0 = System.nanoTime()
      val ts = (1 to nThreads).map { _ =>
        new Thread(() => { sink ^= mixLoop(iters) })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    val single = (1 to reps).map(_ => once()).min
    val par = (1 to reps).map(_ => onceParallel()).min
    if (sink == 42L) println("") // keep the work observable
    (single, par)
  }

  /** The registered number for one query given its (sec, stealTicks)
    * reps: min over STEAL-QUIET reps when any exist (quiet = steal
    * during the rep < `quietThreshold` ticks), else min over all reps
    * with `quiet=false` — the caller (and the round's judge) can then
    * machine-read whether the total needs a noise adjudication at all.
    */
  private[graft] def registered(reps: Seq[(Double, Long)],
                                quietThreshold: Long): (Double, Boolean) = {
    val quiet = reps.filter(_._2 < quietThreshold)
    if (quiet.nonEmpty) (quiet.map(_._1).min, true)
    else (reps.map(_._1).min, false)
  }

  /** Self-healing rep policy (VERDICT r16 #1): a headline whose reps
    * are ALL steal-contaminated gets re-repped — its registered number
    * would otherwise be a noise sample (r16 driver run:
    * q_containment_join read 70.6 s worst-rep at 546 steal ticks with
    * zero quiet reps, overstating the whole total). Healing is
    * bounded at `maxReps` TOTAL reps per query; a query still quiet-
    * less at the bound carries an explicit `reps_exhausted` marker in
    * the artifact instead of a silent `quiet:false` row.
    */
  private[graft] def needsHealing(reps: Seq[(Double, Long)],
                                  quietThreshold: Long,
                                  maxReps: Int): Boolean =
    reps.nonEmpty && reps.forall(_._2 >= quietThreshold) &&
      reps.size < maxReps

  /** True when a query exhausted its healing budget without a single
    * steal-quiet rep — the artifact's machine-readable "this number
    * is a noise floor, adjudicate elsewhere" marker.
    */
  private[graft] def repsExhausted(reps: Seq[(Double, Long)],
                                   quietThreshold: Long,
                                   maxReps: Int): Boolean =
    reps.size >= maxReps && reps.forall(_._2 >= quietThreshold)

  /** The CPU-control single-thread seconds of the round-14 registered
    * basis (BASELINE.md: single 0.38–0.41 s across five runs) — the
    * reference host generation every cross-round total normalizes to.
    */
  private[graft] val ControlRefSingle = 0.39

  /** Host-generation normalization, applied MECHANICALLY (VERDICT r14
    * #3): the fixed mix-loop runs the same work every round, so
    * `total × (ref / run)` restates a total as if measured on the
    * reference host — a slower host (run > ref) deflates its inflated
    * walls, a faster one inflates them. Non-positive/absent control
    * (the /proc-less fallback) leaves the total unscaled rather than
    * dividing by zero.
    */
  private[graft] def normalizedTotal(total: Double, controlRun: Double,
                                     controlRef: Double = ControlRefSingle)
      : Double =
    if (controlRun > 0.0 && controlRef > 0.0) total * (controlRef / controlRun)
    else total

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Silence WindowExec's "No Partition Defined" WARN for this run
    // ONLY: every partition-less window in the engine is bounded by
    // construction (Packing.scala per-partition totals, <= P rows,
    // spec-pinned; one-row KPI frames) and the warning repeated 32
    // headlines x 3 reps buries the artifact log (VERDICT r15 minor).
    // Scoped to the one class so a NEW unbounded window introduced
    // elsewhere still warns in tests and in Verify.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // One warm-up pass amortizes JVM/codegen startup out of the numbers;
    // each headline is then timed end-to-end (plan + execute) `reps`
    // times and the min over STEAL-QUIET reps reported — the
    // environment is noisy across runs (identical binaries have
    // measured 2-3x apart; see BASELINE.md), and min-of-quiet-reps is
    // the standard way to estimate the real cost under interference the
    // query didn't cause. ~300 ticks during a multi-second rep is the
    // empirical quiet line from the round-13 steal study.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val quietThreshold =
      sys.env.getOrElse("SPARK_GRAFT_STEAL_QUIET", "300").toLong
    val headlines = SparkEntry.headlines
    val (ctlS0, ctlP0) = cpuControl()
    // BenchAction.consumeAll (not .count) so column pruning can't delete the
    // measured work — a projection-only headline timed via count() measures
    // a pruned scan, not the projection.
    headlines.foreach { q =>
      try BenchAction.consumeAll(q.fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    // Timed reps run as ROUND-ROBIN PASSES over the whole suite, not
    // back-to-back per query: the host shows multi-second CPU-steal bursts,
    // and consecutive reps of one query share the same burst.
    // Separated-in-time reps make min-per-query an estimate of the real
    // cost rather than of the noise window.
    val samples =
      collection.mutable.Map.empty[String, List[(Double, Long)]]
        .withDefaultValue(Nil)
    val rows = collection.mutable.Map.empty[String, Long]
    def timeOne(q: graft.queries.GraftQuery): Unit = {
      val s0 = stealTicks()
      val t0 = System.nanoTime()
      val n = try { BenchAction.consumeAll(q.fn(spark, sfDir)) } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      samples(q.name) = samples(q.name) :+ ((sec, stealTicks() - s0))
      rows.getOrElseUpdate(q.name, n)
    }
    (1 to reps).foreach { _ => headlines.foreach(timeOne) }
    // Self-healing passes (VERDICT r16 #1): re-rep ONLY the headlines
    // with zero steal-quiet reps, still round-robin (a whole-suite
    // steal burst contaminates one pass, not the healing passes that
    // follow), until each has a quiet rep or hits maxReps total.
    val maxReps = math.max(reps,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_REPS", "6").toInt)
    var healing = headlines.filter(q =>
      needsHealing(samples(q.name), quietThreshold, maxReps))
    while (healing.nonEmpty) {
      healing.foreach(timeOne)
      healing = headlines.filter(q =>
        needsHealing(samples(q.name), quietThreshold, maxReps))
    }
    val results = headlines.map { q =>
      val (sec, quiet) = registered(samples(q.name), quietThreshold)
      (q.name, sec, rows(q.name), quiet)
    }
    val exhausted = headlines.map(_.name).filter(n =>
      repsExhausted(samples(n), quietThreshold, maxReps))
    def fmt(d: Double): String = f"$d%.3f"
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // row counts catch silently-empty results that a pure timing line
    // would happily report as "fast"
    val rs = results.map { case (k, _, n, _) => s"\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    // per-rep raw evidence: the artifact adjudicates itself — a reader
    // (human or judge) sees exactly which reps were steal-contaminated
    val repJson = results.map { case (k, _, _, _) =>
      s"\"" + k + "\":" + samples(k).map { case (sec, st) =>
        s"""{"sec":${fmt(sec)},"steal":$st}"""
      }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val qq = results.map { case (k, _, _, quiet) => s"\"" + k + "\":" + quiet }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val allQuiet = results.forall(_._4)
    val (ctlS1, ctlP1) = cpuControl()
    val control = s"""{"single":${fmt(ctlS0)},"parallel":${fmt(ctlP0)},""" +
      s""""singleEnd":${fmt(ctlS1)},"parallelEnd":${fmt(ctlP1)},""" +
      s""""refSingle":${fmt(ControlRefSingle)}}"""
    // host-generation normalization, in the artifact itself (VERDICT r14
    // #3): best (min) single-thread control of the run is the host's
    // speed on fixed work; the normalized total is directly comparable
    // across rounds with no prose adjudication
    val controlRun = math.min(ctlS0, ctlS1)
    val normTotal = normalizedTotal(total, controlRun)
    // Full self-adjudicating evidence (per-rep walls + steal, row
    // counts, per-query quiet verdicts) goes to a FILE: 14 rounds of
    // BENCH_rN.json carried `parsed: null` because this object printed
    // as one huge [info] line that the driver's tail-capture truncated
    // mid-object (VERDICT r14 #2). The driver parses stdout's final
    // line, so that line must stay SMALL — everything bulky lives here.
    val evidence =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""normalized_value":${fmt(normTotal)},""" +
      s""""queries":$qs,"rows":$rs,"sf":"$sfDir",""" +
      s""""quiet":$allQuiet,"stealQuietThreshold":$quietThreshold,""" +
      s""""maxReps":$maxReps,""" +
      exhausted.map("\"" + _ + "\"").mkString(
        // same key spelling as the stdout artifact line below — two
        // spellings made downstream adjudication tooling special-case
        // the marker per emission (ADVICE r17)
        "\"reps_exhausted\":[", ",", "],") +
      s""""control":$control,"queryQuiet":$qq,"reps":$repJson}"""
    val evPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVIDENCE",
      "bench_evidence.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(evPath),
      (evidence + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] evidence write to $evPath failed: $e") }
    // The machine-parsable artifact line must be the LAST stdout content
    // of the whole sbt invocation (the driver parses the final line), so:
    // stop Spark and mute its loggers FIRST — shutdown chatter must not
    // trail the JSON — then print compact (~1 KB for 32 headlines):
    // registered totals raw AND normalized, per-query registered
    // seconds, the run's control, and where the full evidence lives.
    spark.stop()
    org.apache.logging.log4j.LogManager.getRootLogger match {
      case l: org.apache.logging.log4j.core.Logger =>
        l.getContext.getConfiguration.getRootLogger
          .setLevel(org.apache.logging.log4j.Level.OFF)
        l.getContext.updateLoggers()
      case _ => ()
    }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""normalized_value":${fmt(normTotal)},""" +
      s""""control_run":${fmt(controlRun)},""" +
      s""""control_ref":${fmt(ControlRefSingle)},""" +
      s""""quiet":$allQuiet,""" +
      exhausted.map("\"" + _ + "\"").mkString(
        "\"reps_exhausted\":[", ",", "],") +
      s""""sf":"$sfDir","evidence":"$evPath",""" +
      s""""queries":$qs}""")
    System.out.flush()
  }
}
