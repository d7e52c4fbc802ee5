package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Streaming state durability across a REAL query restart — the
  * production recovery path the MemoryStream specs cannot exercise
  * (NOTES_r12: a restarted MemoryStream query replays the whole stream
  * with fresh state, so those specs use one long-lived query).
  *
  * Harness: a FILE source (parquet dir; the source's processed-file log
  * lives in the checkpoint, so phase-1 files are NOT re-read on
  * restart), an explicit `checkpointLocation` (offset log + state
  * store), and a parquet FILE sink (its `_spark_metadata` manifest makes
  * committed output exactly-once across restarts). Each test: run phase
  * 1, `stop()` the query, drop phase-2 files, start a NEW query object
  * on the same checkpoint/sink, and assert the state RESUMED — phase-2
  * answers depend on phase-1 state in a way a fresh-state replay cannot
  * reproduce:
  *
  *  - PackStream: phase-2 pack ids continue phase-1's running token
  *    total (fresh state would restart the prefix at 0 and diverge from
  *    the batch oracle); every id lands exactly once (no replay).
  *  - SketchStream: per-key `upto` counters read {1, 2} across the two
  *    phases (fresh state would emit a second upto = 1) and the merged
  *    theta bytes equal the one-shot batch fold byte-for-byte.
  *  - NearDupStream: planted near-dup clones arrive ONLY in phase 2;
  *    their pairs can only form against phase-1 bucket members held in
  *    the restored state store, because phase-1 files are never re-read.
  */
class CheckpointRestartSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, sf)
    .select($"doc_id", $"text")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Run one streaming phase: start on the parquet `inDir` with the
    * given transform, sink to parquet `outDir` under `ckpt`, drain, and
    * STOP — the restart boundary between calls.
    */
  private def runPhase(inDir: String, schema: StructType, ckpt: String,
                       outDir: String)(xf: DataFrame => DataFrame): Unit = {
    val q = xf(spark.readStream.schema(schema).parquet(inDir))
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", outDir)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("PackStream: pack totals resume across a checkpointed restart") {
    val inDir = tmp("pack_in"); val ckpt = tmp("pack_ckpt")
    val outDir = tmp("pack_out")
    val counts = PackStream.tokenCounts(docs).collect().sortBy(_.id)
    val (b1, b2) = counts.splitAt(counts.length / 2)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("n_tokens", LongType)))
    def drop(batch: Array[PackStream.DocTokens]): Unit =
      batch.toSeq.toDF().coalesce(1).write.mode("append").parquet(inDir)

    drop(b1)
    runPhase(inDir, schema, ckpt, outDir)(df =>
      PackStream.assignPacks(df.as[PackStream.DocTokens], 2000L).toDF())
    drop(b2)
    runPhase(inDir, schema, ckpt, outDir)(df =>
      PackStream.assignPacks(df.as[PackStream.DocTokens], 2000L).toDF())

    val sink = spark.read.parquet(outDir)
    // exactly-once: every doc assigned exactly once, none replayed
    assert(PackStream.violations(sink).count() == 0)
    val streamed = PackStream.packedDocs(sink)
      .as[(Long, Long, Long)].collect()
    assert(streamed.length == counts.length,
      s"expected ${counts.length} single assignments, got ${streamed.length}")
    // resumed, not restarted: phase-2 assignments continue phase-1's
    // token prefix — equal to the batch oracle over the WHOLE corpus
    val batch = graft.operators.Packing.packByTokenBudget(docs, 2000L)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(streamed.map(r => r._1 -> (r._2, r._3)).toMap == batch)
    // and the batch boundary genuinely split packs (guard against a
    // degenerate fixture where phase 2 would start at pack 0 anyway)
    val phase2FirstPack = streamed.toSeq.filter(_._1 >= b2.head.id)
      .minBy(_._1)._3
    assert(phase2FirstPack > 0L,
      "fixture too small: phase 2 must not begin at pack 0")
  }

  test("SketchStream: theta state resumes (upto continues; bytes == batch fold)") {
    val inDir = tmp("th_in"); val ckpt = tmp("th_ckpt")
    val outDir = tmp("th_out")
    val schema = StructType(Seq(StructField("key", StringType),
      StructField("v", StringType)))
    val half1 = docs.filter($"doc_id" < 250)
      .select(($"doc_id" % 3).cast("string").as("key"), $"text".as("v"))
    val half2 = docs.filter($"doc_id" >= 250)
      .select(($"doc_id" % 3).cast("string").as("key"), $"text".as("v"))

    half1.coalesce(1).write.mode("append").parquet(inDir)
    runPhase(inDir, schema, ckpt, outDir)(df =>
      SketchStream.thetaByKey(df, "key", "v").toDF())
    half2.coalesce(1).write.mode("append").parquet(inDir)
    runPhase(inDir, schema, ckpt, outDir)(df =>
      SketchStream.thetaByKey(df, "key", "v").toDF())

    val sink = spark.read.parquet(outDir)
    // every key updated once per phase, and the RESTARTED phase reads
    // the prior batch counter from the restored state (upto = 2);
    // fresh state would emit a second upto = 1 row instead
    val uptos = sink.groupBy("key")
      .agg(sort_array(collect_list($"upto")).as("u"))
      .select("u").as[Seq[Long]].collect()
    assert(uptos.nonEmpty)
    uptos.foreach(u => assert(u == Seq(1L, 2L),
      s"expected per-key upto [1, 2] across the restart, got $u"))
    // merged bytes equal the one-shot batch fold (exact-mode theta
    // compact images are slicing-invariant byte-for-byte)
    val streamedBytes = SketchStream.latestStates(sink, "theta")
      .as[(String, Array[Byte])].collect()
      .map(r => r._1 -> r._2.toSeq).toMap
    val batchBytes = SketchStream.thetaByKey(
        docs.select(($"doc_id" % 3).cast("string").as("key"),
          $"text".as("v")), "key", "v")
      .toDF().as[(String, Array[Byte], Double, Long)].collect()
      .map(r => r._1 -> r._2.toSeq).toMap
    assert(streamedBytes == batchBytes)
  }

  test("NearDupStream: phase-2 clones pair against phase-1 state only") {
    val inDir = tmp("nd_in"); val ckpt = tmp("nd_ckpt")
    val outDir = tmp("nd_out")
    val base = docs.filter($"doc_id" < 200)
    // EXACT clones of every 20th doc under new ids: identical text →
    // identical signature → all bands collide, so the cross-phase pair
    // is guaranteed (a one-token substitution would only band-collide
    // probabilistically and make the assert flaky); the pair members
    // sit in DIFFERENT phases, which is the point
    val clones = base.filter($"doc_id" % 20 === 0)
      .select(($"doc_id" + 100000L).as("doc_id"), $"text")
    val banded = NearDupStream.bandedSignatures(base)
    val schema = banded.toDF().schema

    banded.toDF().coalesce(1).write.mode("append").parquet(inDir)
    runPhase(inDir, schema, ckpt, outDir)(df => {
      import df.sparkSession.implicits._
      NearDupStream.candidatePairs(
        df.as[NearDupStream.BandedDoc]).toDF()
    })
    NearDupStream.bandedSignatures(clones).toDF()
      .coalesce(1).write.mode("append").parquet(inDir)
    runPhase(inDir, schema, ckpt, outDir)(df => {
      import df.sparkSession.implicits._
      NearDupStream.candidatePairs(
        df.as[NearDupStream.BandedDoc]).toDF()
    })

    val sink = spark.read.parquet(outDir)
    assert(NearDupStream.overflowedBuckets(sink).count() == 0)
    val pairs = NearDupStream.distinctPairs(sink)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val planted = base.filter($"doc_id" % 20 === 0)
      .select($"doc_id").as[Long].collect()
      .map(id => (id, id + 100000L)).toSet
    // clones streamed AFTER the restart; their phase-1 partners were
    // never re-read (file-source log), so these pairs exist iff the
    // bucket member lists were restored from the state store
    assert(planted.nonEmpty)
    assert(planted.subsetOf(pairs),
      s"missing cross-restart pairs: ${(planted -- pairs).take(5)}")
  }
}
