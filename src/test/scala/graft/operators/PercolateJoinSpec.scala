package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Registry-scale percolation: the broadcast-table path must be
  * BIT-identical to the plan-literal path (same frozen statistics, same
  * token-ordered fold — unmatched terms add IEEE-exact +0.0), admit
  * registries beyond the literal path's cap, keep the stateless
  * scan → project → generate → filter plan below the ×1-row broadcast
  * (streaming-legal), and guard loudly.
  */
class PercolateJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  private lazy val indexPath = {
    val p = java.nio.file.Files.createTempDirectory("perc_idx").toString
    Bm25.saveIndex(docs, p)
    p
  }
  private lazy val index = Bm25.loadIndex(spark, indexPath)

  private def asTriples(df: org.apache.spark.sql.DataFrame) =
    df.select($"query_id".cast("long"), $"doc_id".cast("long"), $"score")
      .as[(Long, Long, Double)].collect().toSet

  // corpus-vocabulary queries (the TextMiningSuite fixture terms) plus
  // an index-unseen term (df = 0 novelty) — made-up terms never matched
  // and made every threshold degenerate in the first cut of this spec
  private def vocabQueries = Seq(
    (0L, "fast sort merge"),
    (1L, "spark stream window"),
    (2L, "hash join key vector"),
    (3L, "zzunseen spark hash"))
    .toDF("query_id", "query_text")

  test("bit-equality with the literal path across thresholds") {
    val qs = vocabQueries
    val prep = Bm25.preparePercolate(index, qs)
    val compiled = Bm25.compilePercolateTable(index, qs)
    for (t <- Seq(0.5, 1.0, 1.5, 3.0)) {
      val lit = asTriples(Bm25.percolate(docs, prep, threshold = t))
      val join = asTriples(Bm25.percolateJoin(docs, compiled, threshold = t))
      assert(join == lit, s"threshold $t: join path diverged from literal")
      assert(t > 1.4 || lit.nonEmpty, s"degenerate fixture at threshold $t")
    }
  }

  test("registry beyond the literal cap: one query per document") {
    // 500 queries at sf0.001 — already over preparePercolate's default
    // 1000 at larger SFs; the compiled-table path takes it relationally
    val registry = docs.select($"doc_id".as("query_id"),
      concat_ws(" ", slice(graft.functions.TextFunctions.tokens($"text"),
        1, 5)).as("query_text"))
      .filter(length($"query_text") > 0)
    val compiled = Bm25.compilePercolateTable(index, registry)
    val out = Bm25.percolateJoin(docs, compiled, threshold = 1.5)
    val n = out.count()
    assert(n > 0, "registry-scale percolation matched nothing")
    // each doc matches its own prefix-query (it contains all its terms)
    val selfHits = out.filter($"query_id" === $"doc_id").count()
    val nq = registry.count()
    assert(selfHits <= nq)
    // spot-exactness: one (query, doc) score replayed via the batch
    // engine's topK on the same index (shared scoring core)
    val q1 = registry.filter($"query_id" === 7L)
    if (q1.count() == 1) {
      val full = Bm25.queryIndex(index, q1, k = 1000)
        .filter($"doc_id" === 7L).select($"score").as[Double].collect()
      val perc = out.filter($"query_id" === 7L && $"doc_id" === 7L)
        .select($"score").as[Double].collect()
      if (full.nonEmpty && full.head >= 1.5)
        assert(perc.toSeq == full.toSeq,
          s"percolated score ${perc.toSeq} != engine score ${full.toSeq}")
    }
  }

  test("plan below the broadcast is stateless: no exchange, no aggregate") {
    val qs = Seq((1L, "the quick")).toDF("query_id", "query_text")
    val compiled = Bm25.compilePercolateTable(index, qs)
    // materialize the one-row side first so its plan doesn't appear
    val frozen = {
      val r = compiled.collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(r.toIndexedSeq), compiled.schema)
    }
    val p = Bm25.percolateJoin(docs, frozen, threshold = 1.0)
      .queryExecution.executedPlan.toString
    // the one legitimate Exchange is the x1-row BroadcastExchange; any
    // hash/range exchange means the doc side shuffled
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning") &&
      !p.contains("ShuffleExchange"),
      s"percolateJoin plan shuffles:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"percolateJoin plan aggregates:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected the x1-row broadcast join:\n$p")
  }

  test("streaming docs: append-mode run equals the batch run") {
    implicit val sq = spark.sqlContext
    val compiled = Bm25.compilePercolateTable(index, vocabQueries)
    val batch = asTriples(Bm25.percolateJoin(docs, compiled, threshold = 1.0))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = Bm25.percolateJoin(in.toDF().toDF("doc_id", "text"),
        compiled, threshold = 1.0)
      .writeStream.format("memory").queryName("perc_join_stream")
      .outputMode("append").start()
    try {
      val rows = docs.as[(Long, String)].collect()
      val (h1, h2) = rows.splitAt(rows.length / 2)
      in.addData(h1.toSeq); q.processAllAvailable()
      in.addData(h2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = asTriples(spark.table("perc_join_stream"))
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("null text is excluded, not scored") {
    val qs = Seq((1L, "the quick")).toDF("query_id", "query_text")
    val compiled = Bm25.compilePercolateTable(index, qs)
    val withNull = docs.unionByName(
      Seq((999999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = Bm25.percolateJoin(withNull, compiled, threshold = 0.1)
    assert(out.filter($"doc_id" === 999999L).count() == 0)
  }

  test("a null registry query_id is rejected at compile, not mis-folded") {
    // the percolateJoin segment fold uses a null accumulator qid as its
    // "no open segment" sentinel — a null registry id would alias it
    val qs = Seq((java.lang.Long.valueOf(1L), "the quick"),
        (null.asInstanceOf[java.lang.Long], "spark hash"))
      .toDF("query_id", "query_text")
    val ex = intercept[IllegalArgumentException] {
      Bm25.compilePercolateTable(index, qs)
    }
    assert(ex.getMessage.contains("null"))
  }

  test("guards: empty registry, oversized query, bad threshold") {
    val empty = Seq.empty[(Long, String)].toDF("query_id", "query_text")
    intercept[IllegalArgumentException] {
      Bm25.compilePercolateTable(index, empty)
    }
    val fat = Seq((1L, (1 to 100).map(i => s"w$i").mkString(" ")))
      .toDF("query_id", "query_text")
    intercept[IllegalArgumentException] {
      Bm25.compilePercolateTable(index, fat, maxTermsPerQuery = 64)
    }
    val qs = Seq((1L, "the")).toDF("query_id", "query_text")
    val compiled = Bm25.compilePercolateTable(index, qs)
    intercept[IllegalArgumentException] {
      Bm25.percolateJoin(docs, compiled, threshold = 0.0)
    }
  }

  test("duplicate registry qids are rejected, including long-cast collisions") {
    // duplicate qids would silently SUM their term scores in the
    // qid-major segment fold; '1' and '01' collide only after the cast
    val dup = Seq(("1", "fast sort"), ("01", "spark hash"))
      .toDF("query_id", "query_text")
    val ex = intercept[IllegalArgumentException] {
      Bm25.compilePercolateTable(index, dup)
    }
    assert(ex.getMessage.contains("duplicate"))
  }

  test("probe is ANSI-safe: registry misses yield null entries, not errors") {
    // try_element_at keeps the two-level map probe legal under
    // spark.sql.ansi.enabled=true (element_at raises on missing keys)
    val compiled = Bm25.compilePercolateTable(index, vocabQueries)
    val expected = asTriples(
      Bm25.percolateJoin(docs, compiled, threshold = 1.0))
    val before = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val ansi = asTriples(
        Bm25.percolateJoin(docs, compiled, threshold = 1.0))
      assert(ansi == expected)
      assert(ansi.nonEmpty)
    } finally spark.conf.set("spark.sql.ansi.enabled", before)
  }
}
