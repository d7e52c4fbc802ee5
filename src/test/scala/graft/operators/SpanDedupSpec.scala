package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.TextFunctions

class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toks(pairs: Seq[(Long, String)]) =
    pairs.toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))

  test("hand-computed coverage: overlapping shared 3-grams merge") {
    // docs 1 and 2 share the passage "s1 s2 s3 s4" at different offsets;
    // shared 3-grams are (s1 s2 s3) and (s2 s3 s4). Their cover sets
    // overlap and must merge: 4 covered tokens each, not 6.
    val docs = toks(Seq(
      (1L, "x1 x2 s1 s2 s3 s4"),
      (2L, "y1 s1 s2 s3 s4 y2"),
      (3L, "z1 z2 z3")))
    val got = SpanDedup.dupSpanCoverage(docs, "doc_id", "toks", k = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 6L, 4L, 0.666667),
      (2L, 6L, 4L, 0.666667),
      (3L, 3L, 0L, 0.0)))
  }

  test("documents shorter than k carry no window and are excluded") {
    val docs = toks(Seq((1L, "a b"), (2L, "a b c d")))
    val got = SpanDedup.dupSpanCoverage(docs, "doc_id", "toks", k = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((2L, 4L, 0L, 0.0)))
  }

  test("an in-doc repeat alone is not cross-document duplication") {
    // the repeated trigram sits in ONE doc only (df counts distinct
    // docs), so nothing is covered
    val docs = toks(Seq((1L, "a b c a b c"), (2L, "d e f g")))
    val got = SpanDedup.dupSpanCoverage(docs, "doc_id", "toks", k = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._3) == Seq(0L, 0L))
  }

  test("full-document clones cover every token") {
    val docs = toks(Seq((1L, "p q r s t"), (2L, "p q r s t")))
    val got = SpanDedup.dupSpanCoverage(docs, "doc_id", "toks", k = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 5L, 5L, 1.0), (2L, 5L, 5L, 1.0)))
  }

  test("removeDupSpans: keeper keeps its text, later docs lose the span") {
    // docs 1 and 2 share "s1 s2 s3 s4"; doc 1 is the global keeper
    // (min id) so its text survives byte-identical; doc 2 loses the 4
    // covered positions (two overlapping 3-grams union, not 6 tokens)
    val docs = toks(Seq(
      (1L, "x1 x2 s1 s2 s3 s4"),
      (2L, "y1 s1 s2 s3 s4 y2"),
      (3L, "z1 z2 z3")))
    val got = SpanDedup.removeDupSpans(docs, "doc_id", "toks", k = 3)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 6L, 0L, "x1 x2 s1 s2 s3 s4"),
      (2L, 6L, 4L, "y1 y2"),
      (3L, 3L, 0L, "z1 z2 z3")))
  }

  test("removeDupSpans: fully-duplicated non-keeper doc empties, short docs pass through") {
    val docs = toks(Seq(
      (1L, "a b c"),
      (2L, "a b c"),
      (3L, "p q"))) // < k: no window, untouched
    val got = SpanDedup.removeDupSpans(docs, "doc_id", "toks", k = 3)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 0L, "a b c"),
      (2L, 3L, 3L, ""),
      (3L, 2L, 0L, "p q")))
  }
}
