package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Streaming incremental packing: batch parity with packByTokenBudget /
  * packIncremental, REAL cross-batch state (one long-lived query,
  * per-micro-batch addData + processAllAvailable — a query RESTART
  * without a checkpoint would replay the whole MemoryStream with fresh
  * state and prove nothing), micro-batch-boundary invariance, and the
  * loud violation contract.
  */
class PackStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  private def startQuery(in: MemoryStream[(Long, Long)], budget: Long,
                         priorTokens: Long, maxPackedId: Long,
                         name: String): StreamingQuery = {
    val assigned = PackStream.assignPacks(
      in.toDF().toDF("id", "n_tokens").as[PackStream.DocTokens],
      budget, priorTokens, maxPackedId)
    assigned.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
  }

  test("batch mode: assignment equals packByTokenBudget on the corpus") {
    val streamed = PackStream.packedDocs(
      PackStream.assignPacks(PackStream.tokenCounts(docs), 2000L).toDF())
      .as[(Long, Long, Long)].collect().toMap2
    val batch = graft.operators.Packing.packByTokenBudget(docs, 2000L)
      .as[(Long, Long, Long)].collect().toMap2
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("cross-batch state: a later micro-batch continues the prefix") {
    implicit val sq = spark.sqlContext
    val counts = PackStream.tokenCounts(docs)
      .collect().sortBy(_.id).map(d => (d.id, d.n_tokens))
    val (b1, b2) = counts.splitAt(counts.length / 2)
    val in = MemoryStream[(Long, Long)]
    val name = "pack_stream_spec"
    val q = startQuery(in, 2000L, 0L, Long.MinValue, name)
    try {
      in.addData(b1.toSeq)
      q.processAllAvailable()
      val afterB1 = PackStream.packedDocs(spark.table(name)).count()
      assert(afterB1 == b1.length.toLong)
      in.addData(b2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = PackStream.packedDocs(spark.table(name))
      .as[(Long, Long, Long)].collect().toMap2
    val batch = graft.operators.Packing.packByTokenBudget(docs, 2000L)
      .as[(Long, Long, Long)].collect().toMap2
    assert(streamed == batch)
  }

  test("assignment is micro-batch-boundary invariant (one doc per batch)") {
    implicit val sq = spark.sqlContext
    val counts = PackStream.tokenCounts(docs.filter($"doc_id" < 25))
      .collect().sortBy(_.id).map(d => (d.id, d.n_tokens))
    val in = MemoryStream[(Long, Long)]
    val name = "pack_split_spec"
    val q = startQuery(in, 500L, 0L, Long.MinValue, name)
    try {
      counts.foreach { row =>
        in.addData(Seq(row))
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = PackStream.packedDocs(spark.table(name))
      .as[(Long, Long, Long)].collect().toMap2
    val oneBatch = PackStream.packedDocs(
      PackStream.assignPacks(
        PackStream.tokenCounts(docs.filter($"doc_id" < 25)), 500L).toDF())
      .as[(Long, Long, Long)].collect().toMap2
    assert(streamed == oneBatch)
    assert(streamed.nonEmpty)
  }

  test("priorTokens/maxPackedId seed continues a packed corpus exactly") {
    val prior = docs.filter($"doc_id" < 250)
      .agg(coalesce(sum(size(graft.functions.TextFunctions
        .tokens($"text"))).cast("long"), lit(0L))).head().getLong(0)
    val streamed = PackStream.packedDocs(
      PackStream.assignPacks(
        PackStream.tokenCounts(docs.filter($"doc_id" >= 250)), 2000L,
        priorTokens = prior, maxPackedId = 249L).toDF())
      .as[(Long, Long, Long)].collect().toMap2
    val full = graft.operators.Packing.packByTokenBudget(docs, 2000L)
      .filter($"doc_id" >= 250)
      .as[(Long, Long, Long)].collect().toMap2
    assert(streamed == full)
    assert(streamed.nonEmpty)
  }

  test("out-of-order id emits a violation marker and leaves totals alone") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val name = "pack_violation_spec"
    val q = startQuery(in, 1000L, 0L, Long.MinValue, name)
    try {
      in.addData(Seq((10L, 600L), (11L, 600L)))
      q.processAllAvailable()
      // id 5 sorts before the already-assigned 11 — violation; id 12
      // must pack as if 5 never arrived
      in.addData(Seq((5L, 999L), (12L, 600L)))
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table(name)
    val bad = PackStream.violations(hits).as[(Long, Long)].collect().toSeq
    assert(bad == Seq((5L, 999L)))
    val packs = PackStream.packedDocs(hits)
      .as[(Long, Long, Long)].collect().toMap2
    // prefixes: 10 -> 0, 11 -> 600, 12 -> 1200 (untouched by doc 5)
    assert(packs == Map(10L -> (600L, 0L), 11L -> (600L, 0L),
      12L -> (600L, 1L)))
  }

  test("the seeded maxPackedId rejects ids at or below the packed range") {
    val in = Seq((249L, 10L), (250L, 10L)).toDF("id", "n_tokens")
      .as[PackStream.DocTokens]
    val hits = PackStream.assignPacks(in, 1000L, priorTokens = 5000L,
      maxPackedId = 249L).toDF()
    assert(PackStream.violations(hits).as[(Long, Long)].collect().toSeq ==
      Seq((249L, 10L)))
    assert(PackStream.packedDocs(hits).as[(Long, Long, Long)]
      .collect().toSeq == Seq((250L, 10L, 5L)))
  }

  test("guards: non-positive budget and negative priorTokens throw") {
    val ds = PackStream.tokenCounts(docs.limit(1))
    intercept[IllegalArgumentException] {
      PackStream.assignPacks(ds, 0L)
    }
    intercept[IllegalArgumentException] {
      PackStream.assignPacks(ds, 10L, priorTokens = -1L)
    }
  }

  private implicit class TripleOps(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
