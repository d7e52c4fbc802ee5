package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Registry-scale percolation probe: compile N shingle queries per doc
  * into the broadcast term table and score the whole corpus through
  * percolateJoin — the decontamination shape at the registry sizes the
  * literal path cannot reach (10⁵ queries). Reports compile wall,
  * registry/term counts, scoring wall, docs/sec, and alert volume.
  * Usage: `ProfilePercolate <sfDir> [queriesPerDoc]`. Dev-only.
  */
object ProfilePercolate {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val perDoc = if (args.length > 1) args(1).toInt else 20
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
    // every doc yields up to perDoc distinct benchmark-like queries
    val reg = sh.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("stk"))
      .filter(size(col("stk")) >= 8)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(perDoc - 1)),
          j => concat_ws(" ", slice(col("stk"), j * 2 + 1, lit(6)))))
          .as(Seq("j", "query_text")))
      .filter(length(col("query_text")) > 90) // 6 full 15-char shingles
      .select((col("doc_id") * 1000 + col("j")).as("query_id"),
        col("query_text"))
      .persist()
    val nQueries = reg.count()

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

    if (sys.env.contains("GRAFT_PERC_EXPLAIN")) {
      val p = graft.operators.Bm25.percolateJoin(sh, compiled,
        threshold = 5.0).queryExecution.executedPlan.toString
      println("PLAN nodes with 'flatten' occurrences: " +
        "flatten=" + "flatten\\(".r.findAllIn(p).size +
        " xxhash=" + "xxhash64".r.findAllIn(p).size +
        " aggregate=" + "aggregate\\(".r.findAllIn(p).size)
      println(p.take(4000))
    }
    def steal(): Long =
      scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).map(_.split("\\s+")(8).toLong)
        .getOrElse(0L)
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

    // stage isolation: how much of scoreSec is the match-list build
    // (map probes) vs the per-query fold/explode above it
    val t2 = System.nanoTime()
    val nMatches = graft.operators.Bm25.percolateMatchesOnly(sh, compiled)
      .agg(sum(col("nm"))).head().getLong(0)
    val matchSec = (System.nanoTime() - t2) / 1e9

    println(f"docs=$nDocs%d queries=$nQueries%d distinctTerms=$nTerms%d " +
      f"compileSec=$compileSec%.1f scoreSec=$scoreSec%.1f " +
      f"docsPerSec=${nDocs / scoreSec}%.0f alerts=$alerts%d " +
      f"matchSec=$matchSec%.1f totalMatches=$nMatches%d")
    spark.stop()
  }
}
