package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.Dedup

/** Streaming MinHash-LSH near-dup: batch parity with the LSH candidate
  * join, REAL cross-batch state via MemoryStream, and the loud
  * overflow contract.
  */
class NearDupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private val base = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank",
    2L -> "the quick brown fox jumps over the lazy dog near the river shore",
    3L -> "completely different content about spark catalyst optimizer rules",
    4L -> "the quick brown fox jumps over the lazy dog near the river bank",
    5L -> "unrelated text mentioning streaming state stores and watermarks")

  test("batch mode: distinct pairs equal the batch LSH candidate join") {
    val docs = corpus(base: _*)
    val streamed = NearDupStream.distinctPairs(
      NearDupStream.candidatePairs(
        NearDupStream.bandedSignatures(docs)).toDF())
      .select("a", "b").as[(Long, Long)].collect().toSet
    val sigs = Dedup.signatures(docs, "doc_id", "text",
      Dedup.DefaultShingleK, 64)
    val batch = Dedup.lshCandidatePairsFromSigs(sigs)
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // the fixture actually pairs: exact clones 1-4 must be present
    assert(streamed.contains((1L, 4L)))
  }

  test("exact clones carry est = 1.0; the estimate column is the " +
       "signature agreement fraction") {
    val docs = corpus(base: _*)
    val pairs = NearDupStream.distinctPairs(
      NearDupStream.candidatePairs(
        NearDupStream.bandedSignatures(docs)).toDF())
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3)
      .toMap
    assert(pairs((1L, 4L)) == 1.0)
    pairs.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("streaming: a doc arriving in batch 2 pairs with batch-1 state") {
    implicit val sq = spark.sqlContext
    // exact clones so candidacy is GUARANTEED (identical signature ⇒
    // co-bucket in every band), not LSH-probabilistic
    val textA = "the quick brown fox jumps over the lazy dog"
    val b1 = Seq(1L -> textA, 2L -> textA,
      3L -> "completely different content about catalyst optimizer rules")
    val b2 = Seq(4L -> textA,
      5L -> "unrelated text mentioning streaming state stores")
    val in = MemoryStream[(Long, String)]
    val hits = NearDupStream.candidatePairs(
      NearDupStream.bandedSignatures(
        in.toDF().toDF("doc_id", "text")))
    val name = "neardup_stream_spec"
    in.addData(b1)
    val q = hits.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val afterB1 = NearDupStream.distinctPairs(spark.table(name))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(afterB1 == Set((1L, 2L)), s"afterB1=$afterB1")

    in.addData(b2)
    val q2 = hits.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val afterB2 = NearDupStream.distinctPairs(spark.table(name))
      .select("a", "b").as[(Long, Long)].collect().toSet
    // doc 4 (clone of 1 and 2) arrived a batch later and still pairs
    // with BOTH batch-1 members of its buckets — cross-batch state live
    assert(afterB2 == Set((1L, 2L), (1L, 4L), (2L, 4L)),
      s"afterB2=$afterB2")
  }

  test("pair set is micro-batch-boundary invariant under the cap") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val hits = NearDupStream.candidatePairs(
      NearDupStream.bandedSignatures(
        in.toDF().toDF("doc_id", "text")))
    val name = "neardup_split_spec"
    // same five docs, adversarial split: one per micro-batch
    base.foreach { row =>
      in.addData(Seq(row))
      val q = hits.toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val got = NearDupStream.distinctPairs(spark.table(name))
      .select("a", "b").as[(Long, Long)].collect().toSet
    val oneBatch = NearDupStream.distinctPairs(
      NearDupStream.candidatePairs(
        NearDupStream.bandedSignatures(corpus(base: _*))).toDF())
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == oneBatch, s"split=$got oneBatch=$oneBatch")
  }

  test("overflow: cap trips loudly, members drop, pairing stops") {
    // 7 identical docs through maxBucket = 4: arrivals 1..4 pair
    // freely (C(4,2) = 6 pairs), arrival 5 trips the marker, arrivals
    // 6-7 are ignored by the closed bucket
    val clones = (1L to 7L).map(i => i -> "same text in every single doc")
    val hits = NearDupStream.candidatePairs(
      NearDupStream.bandedSignatures(corpus(clones: _*)), maxBucket = 4)
      .toDF()
    val pairs = NearDupStream.distinctPairs(hits)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == (for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)).toSet, s"pairs=$pairs")
    val over = NearDupStream.overflowedBuckets(hits)
      .as[(Int, Long, Long)].collect()
    // identical docs share every band bucket: all 8 bands overflow, each
    // marker recording the arrival count that tripped the cap (5)
    assert(over.length == 8, s"over=${over.toSeq}")
    assert(over.forall(_._3 == 5L), s"over=${over.toSeq}")
  }

  test("state stays bounded: a closed bucket holds no members") {
    // the overflow corpus again, probing state size indirectly — after
    // the cap trips, a NEW near-identical doc must produce no pairs
    // (members were dropped, not retained)
    val clones = (1L to 6L).map(i => i -> "boilerplate every doc shares")
    val late = Seq(99L -> "boilerplate every doc shares")
    val hits = NearDupStream.candidatePairs(
      NearDupStream.bandedSignatures(corpus((clones ++ late): _*)),
      maxBucket = 3).toDF()
    val pairsWith99 = NearDupStream.distinctPairs(hits)
      .filter(col("a") === 99L || col("b") === 99L).count()
    assert(pairsWith99 == 0L)
  }
}
