package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[graft.functions.PercolateAlerts]] (the r18 codegen'd percolate
  * kernel) vs the retained HOF fold ([[Bm25.percolateJoinHof]]): score
  * sets must be BIT-identical across thresholds, under codegen AND
  * interpreted evaluation, on a fixture with repeated tokens (tf > 1),
  * multi-term queries, and registry misses. Plus the plan property the
  * kernel exists for: the probe projection participates in whole-stage
  * codegen instead of forcing a fallback boundary that copies the
  * registry map per document row.
  */
class PercolateKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  private lazy val index = {
    val p = java.nio.file.Files.createTempDirectory("perc_k_idx").toString
    Bm25.saveIndex(docs, p)
    Bm25.loadIndex(spark, p)
  }

  // one 5-token prefix query per doc (multi-term, guaranteed corpus
  // hits, plenty of cross-doc shared terms) + an unseen-term query
  private lazy val registry = docs.select($"doc_id".as("query_id"),
      concat_ws(" ", slice(graft.functions.TextFunctions.tokens($"text"),
        1, 5)).as("query_text"))
    .filter(length($"query_text") > 0)
    .unionByName(Seq((999999L, "zzznever seen tokens"))
      .toDF("query_id", "query_text"))

  private lazy val compiled = Bm25.compilePercolateTable(index, registry)

  private def triples(df: org.apache.spark.sql.DataFrame) =
    df.select($"query_id".cast("long"), $"doc_id".cast("long"), $"score")
      .as[(Long, Long, Double)].collect()
      .map { case (q, d, s) =>
        (q, d, java.lang.Double.doubleToRawLongBits(s)) }.toSet

  test("kernel == HOF fold bit-for-bit across thresholds") {
    for (t <- Seq(0.3, 1.0, 2.5, 8.0)) {
      val kern = triples(Bm25.percolateJoin(docs, compiled, threshold = t))
      val hof = triples(Bm25.percolateJoinHof(docs, compiled, threshold = t))
      assert(kern == hof, s"threshold $t: kernel diverged from HOF fold")
    }
    // non-degenerate fixture: low threshold must alert broadly
    assert(triples(Bm25.percolateJoin(docs, compiled,
      threshold = 0.3)).size > 100)
  }

  test("kernel == HOF under interpreted (NO_CODEGEN) evaluation") {
    val key = "spark.sql.codegen.factoryMode"
    val before = spark.conf.get(key, "FALLBACK")
    val expected = triples(Bm25.percolateJoinHof(docs, compiled, 1.0))
    try {
      spark.conf.set(key, "NO_CODEGEN")
      assert(triples(Bm25.percolateJoin(docs, compiled, 1.0)) == expected)
    } finally spark.conf.set(key, before)
  }

  test("repeated tokens: tf counted over the full array, like the HOF") {
    // doc repeating one query term 4x must outscore the single-hit doc
    // and match the HOF fold exactly
    val d2 = Seq((1L, "alpha beta alpha alpha alpha gamma"),
      (2L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val idx2 = {
      val p = java.nio.file.Files.createTempDirectory("perc_k2").toString
      Bm25.saveIndex(d2, p)
      Bm25.loadIndex(spark, p)
    }
    val reg2 = Seq((10L, "alpha gamma")).toDF("query_id", "query_text")
    val c2 = Bm25.compilePercolateTable(idx2, reg2)
    val kern = triples(Bm25.percolateJoin(d2, c2, threshold = 0.01))
    assert(kern == triples(Bm25.percolateJoinHof(d2, c2, threshold = 0.01)))
    assert(kern.size == 2)
  }

  test("probe projection joins whole-stage codegen (no fallback boundary)") {
    // AQE's pre-execution toString hides codegen stars — plan this one
    // query without it
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key)
    val p = try {
      spark.conf.set(key, "false")
      Bm25.percolateJoin(docs, compiled, threshold = 1.0)
        .queryExecution.executedPlan.toString
    } finally spark.conf.set(key, before)
    val probeLine = p.linesIterator
      .find(_.contains("percolate_alerts")).getOrElse("")
    assert(probeLine.nonEmpty, s"kernel expression missing from plan:\n$p")
    // WholeStageCodegen members render with a `*(n)` prefix; the HOF
    // tower rendered as a bare (fallback) Project — the copy boundary
    assert(probeLine.trim.matches("""^[+\-:\s]*\*\(\d+\).*"""),
      s"percolate probe NOT inside whole-stage codegen:\n$probeLine\n$p")
    // and the kernel must sit in a PROJECT below the explode, not
    // inside the Generate node (where qmap would cross the stage
    // boundary by row copy if Generate falls out of codegen)
    assert(!probeLine.contains("Generate"),
      s"kernel inlined into Generate — qmap copy boundary back:\n$probeLine")
  }
}
