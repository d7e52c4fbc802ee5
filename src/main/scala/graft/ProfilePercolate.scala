package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Registry-scale percolation probe: compile N shingle queries per doc
  * into the broadcast term table and score the whole corpus through
  * percolateJoin — the decontamination shape at the registry sizes the
  * literal path cannot reach (10⁵ queries). Reports compile wall,
  * registry/term counts, scoring wall, docs/sec, and alert volume.
  *
  * The `copies` arg (VERDICT r16 #5: cap-scale adjudication) multiplies
  * the registry by compiling the same windows over `copies` tagged
  * variants of each doc (tokens suffixed _j, so copies share no terms
  * — registry size scales, alert volume stays copy-0's): 10 copies ×
  * 5000 docs × 20 windows ≈ the 10⁶-query / 10⁷-posting cap regime.
  * With copies > 1 the run also measures the stored-registry
  * round-trip added in r16: savePercolateTable wall + on-disk bytes,
  * loadPercolateTable wall, and probe-through-the-loaded-table alert
  * parity.
  *
  * Usage: `ProfilePercolate <sfDir> [queriesPerDoc] [copies]`. Dev-only.
  */
object ProfilePercolate {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val perDoc = if (args.length > 1) args(1).toInt else 20
    val nCopies = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // shingled docs (the q_percolate_registry corpus shape)
    val sh = Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 5)
      .repartition(64)
      .select(col("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), size(col("tk")) - 4),
          g => substring(md5(concat_ws(" ", slice(col("tk"), g, lit(5)))),
            1, 15))).as("text"))
      .persist()
    val nDocs = sh.count()

    val idxPath = java.nio.file.Files.createTempDirectory("perc_scale").toString
    graft.operators.Bm25.saveIndex(sh, idxPath)
    val idx = graft.operators.Bm25.loadIndex(spark, idxPath)

    // registry: `perDoc` sliding 6-term shingle windows per doc —
    // every doc yields up to perDoc distinct benchmark-like queries.
    // Copy c > 0 re-emits each window with every shingle suffixed _c:
    // disjoint terms, so the registry (and its term map) scales by
    // `copies` while corpus alerts stay exactly copy-0's.
    val reg = sh.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("stk"))
      .filter(size(col("stk")) >= 8)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(perDoc - 1)),
          j => concat_ws(" ", slice(col("stk"), j * 2 + 1, lit(6)))))
          .as(Seq("j", "query_text")))
      .filter(length(col("query_text")) > 90) // 6 full 15-char shingles
      .crossJoin(spark.range(nCopies).toDF("c"))
      .select(
        (col("doc_id") * 1000 + col("j")
          + col("c") * 100000000L).as("query_id"),
        when(col("c") === 0, col("query_text"))
          .otherwise(concat_ws(" ", transform(split(col("query_text"), " "),
            t => concat(t, lit("_"), col("c"))))).as("query_text"))
      .persist()
    val nQueries = reg.count()

    def steal(): Long =
      scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).map(_.split("\\s+")(8).toLong)
        .getOrElse(0L)

    // GRAFT_PERC_SHARDED=<R>: the cap-scale sharded-registry arm
    // (VERDICT r17 #1 done-criterion "driver heap for compile bounded
    // by shard, not total"). Skips the unsharded compile entirely —
    // run with GRAFT_XMX=8g and copies=12 (≈945k queries): the
    // unsharded one-row compile needed a 48 g driver at this scale,
    // so completing compile+store+probe on the default heap IS the
    // evidence. Alert volume must stay copy-0's (suffixed copies
    // share no terms with the corpus).
    sys.env.get("GRAFT_PERC_SHARDED").foreach { rStr =>
      val r = rStr.toInt
      val tC = System.nanoTime()
      val sharded = graft.operators.Bm25
        .compileShardedPercolateTable(idx, reg, r).persist()
      val nRows = sharded.count()
      println(f"SHARDED R=$r%d queries=$nQueries%d compile " +
        f"${(System.nanoTime() - tC) / 1e9}%.1f s ($nRows%d shard rows)")
      val store = java.nio.file.Files
        .createTempDirectory("perc_sh").toString
      val tS = System.nanoTime()
      graft.operators.Bm25.saveShardedPercolateTable(sharded, store)
      val loaded = graft.operators.Bm25
        .loadShardedPercolateTable(spark, store)
      val storeBytes = java.nio.file.Files
        .walk(java.nio.file.Paths.get(store))
        .filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      println(f"SHARDED save+load ${(System.nanoTime() - tS) / 1e9}%.1f s " +
        f"storeMB=${storeBytes / 1048576.0}%.1f")
      (1 to 2).foreach { i =>
        val s0 = steal(); val t = System.nanoTime()
        val a = graft.operators.Bm25
          .shardedPercolateJoin(sh, loaded, threshold = 5.0).count()
        val sec = (System.nanoTime() - t) / 1e9
        println(f"SHARDED probe rep$i $sec%.1f s " +
          f"(${nDocs / sec}%.0f docs/s, alerts=$a%d, " +
          f"stealTicks=${steal() - s0}%d)")
      }
      spark.stop()
      sys.exit(0)
    }

    val t0 = System.nanoTime()
    val compiled = graft.operators.Bm25.compilePercolateTable(idx, reg)
      .persist()
    // qmap is two-level (radix bucket → term map): the outer key count
    // is the bucket count (capped at 1024), so distinct terms = sum of
    // INNER map sizes
    val nTerms = compiled.select(
      aggregate(map_values(col("qmap")), lit(0),
        (acc, m) => acc + size(m))).head().getInt(0)
    val compileSec = (System.nanoTime() - t0) / 1e9
    val nPostings = graft.operators.Bm25.percolatePostings(compiled).count()

    if (sys.env.contains("GRAFT_PERC_EXPLAIN")) {
      val p = graft.operators.Bm25.percolateJoin(sh, compiled,
        threshold = 5.0).queryExecution.executedPlan.toString
      println("PLAN nodes with 'flatten' occurrences: " +
        "flatten=" + "flatten\\(".r.findAllIn(p).size +
        " xxhash=" + "xxhash64".r.findAllIn(p).size +
        " aggregate=" + "aggregate\\(".r.findAllIn(p).size)
      println(p.take(4000))
    }
    // GRAFT_PERC_AB=1: the r18 root-cause drill-down for the measured
    // linear-in-registry probe cost. Three arms isolate WHERE the
    // linear term lives:
    //  (a) codegen-touch: a pure-codegen expression reads qmap after
    //      the ×1-row join — if flat in registry size, the join itself
    //      and broadcast-value ACCESS are innocent;
    //  (b) fallback-touch: a trivial HOF (CodegenFallback) reads only
    //      the ≤1024 outer map keys — probe work is O(B), so if this
    //      arm is ~linear in registry size the cost is the WSCG stage
    //      BOUNDARY below the interpreted projection (the stage must
    //      emit full UnsafeRows, copying the whole qmap per doc row),
    //      not the probing;
    //  (c) hof-fold-real: the retained pre-r18 HOF fold
    //      (percolateJoinHof) — the before side of the kernel A/B; the
    //      headline scoreReps below run the shipped codegen kernel.
    if (sys.env.contains("GRAFT_PERC_AB")) {
      def rep(label: String)(body: => Long): Unit = (1 to 2).foreach { i =>
        val s0 = steal(); val t = System.nanoTime()
        val n = body
        println(f"AB $label rep$i ${(System.nanoTime() - t) / 1e9}%.2f s " +
          f"(n=$n, stealTicks=${steal() - s0})")
      }
      val shTk = sh.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      rep("codegen-touch ") {
        shTk.crossJoin(broadcast(compiled))
          .select(col("doc_id"),
            (size(col("tk")) + size(map_keys(col("qmap")))).as("nm"))
          .agg(sum(col("nm"))).head().getLong(0)
      }
      rep("fallback-touch") {
        shTk.crossJoin(broadcast(compiled))
          .select(col("doc_id"),
            (size(col("tk")) + size(filter(map_keys(col("qmap")),
              k => k >= 0))).as("nm"))
          .agg(sum(col("nm"))).head().getLong(0)
      }
      rep("hof-fold-real ") {
        graft.operators.Bm25.percolateJoinHof(sh, compiled,
          threshold = 5.0).count()
      }
    }

    // GRAFT_PERC_DOCSCALE=<f1,f2,...>: VERDICT r17 #5 — scale the
    // DOCUMENT side at fixed registry. Tagged copy j > 0 suffixes
    // every shingle _j, so no copy-j token matches a registry term:
    // alert volume stays exactly copy-0's while probe work scales
    // with docs. The probe is corpus-scan × broadcast registry with
    // no exchange before the sink, so wall must be ∝ docs (docs/sec
    // flat in the factor); a superlinear reading here would name a
    // per-partition or accumulation pathology the registry arm
    // cannot see.
    sys.env.get("GRAFT_PERC_DOCSCALE").foreach { fs =>
      for (f <- fs.split(',').map(_.trim.toInt)) {
        val docsF = sh.crossJoin(spark.range(f).toDF("j"))
          .select((col("doc_id") + col("j") * 1000000000L).as("doc_id"),
            when(col("j") === 0, col("text"))
              .otherwise(concat_ws(" ",
                transform(split(col("text"), " "),
                  t => concat(t, lit("_"), col("j"))))).as("text"))
          .localCheckpoint(true)
        val nF = docsF.count()
        (1 to 2).foreach { i =>
          val s0 = steal(); val t = System.nanoTime()
          val a = graft.operators.Bm25.percolateJoin(docsF, compiled,
            threshold = 5.0).count()
          val sec = (System.nanoTime() - t) / 1e9
          println(f"DOCSCALE f=$f%-3d rep$i docs=$nF%d $sec%.2f s " +
            f"(${nF / sec}%.0f docs/s, alerts=$a, " +
            f"stealTicks=${steal() - s0})")
        }
        docsF.unpersist()
      }
    }

    var alerts = 0L
    var scoreSec = Double.MaxValue
    (1 to 3).foreach { i =>
      val s0 = steal()
      val t = System.nanoTime()
      alerts = graft.operators.Bm25.percolateJoin(sh, compiled,
        threshold = 5.0).count()
      val sec = (System.nanoTime() - t) / 1e9
      println(f"scoreRep$i $sec%.1f s stealTicks=${steal() - s0}%d")
      scoreSec = math.min(scoreSec, sec)
    }

    // GRAFT_PERC_MATCHSEC=1: time the RETIRED HOF probe's match-list
    // build (the before-side of the r18 kernel A/B — it pays the
    // CodegenFallback boundary-copy tax, ~115 s at the default sf0.1
    // registry, so it no longer runs by default; the shipped probe is
    // scoreSec above)
    val (matchSec, nMatches) =
      if (sys.env.contains("GRAFT_PERC_MATCHSEC")) {
        val t2 = System.nanoTime()
        val nm = graft.operators.Bm25.percolateMatchesOnly(sh, compiled)
          .agg(sum(col("nm"))).head().getLong(0)
        ((System.nanoTime() - t2) / 1e9, nm)
      } else (-1.0, -1L)

    // stored-registry round-trip at this scale: save wall + on-disk
    // bytes, load wall, and alert parity through the loaded table
    val store = java.nio.file.Files
      .createTempDirectory("perc_store").toString
    val tS = System.nanoTime()
    graft.operators.Bm25.savePercolateTable(compiled, store)
    val saveSec = (System.nanoTime() - tS) / 1e9
    val storeBytes = java.nio.file.Files.walk(java.nio.file.Paths.get(store))
      .filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    val tL = System.nanoTime()
    val loaded = graft.operators.Bm25.loadPercolateTable(spark, store)
      .persist()
    val loadedAlerts = graft.operators.Bm25.percolateJoin(sh, loaded,
      threshold = 5.0).count()
    val loadProbeSec = (System.nanoTime() - tL) / 1e9
    require(loadedAlerts == alerts,
      s"stored-registry probe disagrees: $loadedAlerts vs $alerts")

    println(f"docs=$nDocs%d queries=$nQueries%d postings=$nPostings%d " +
      f"distinctTerms=$nTerms%d " +
      f"compileSec=$compileSec%.1f scoreSec=$scoreSec%.1f " +
      f"docsPerSec=${nDocs / scoreSec}%.0f alerts=$alerts%d " +
      f"matchSec=$matchSec%.1f totalMatches=$nMatches%d " +
      f"saveSec=$saveSec%.1f storeMB=${storeBytes / 1048576.0}%.1f " +
      f"loadProbeSec=$loadProbeSec%.1f loadedAlerts=$loadedAlerts%d")
    spark.stop()
  }
}
