package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toks(pairs: (Long, String)*) =
    pairs.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))

  private def run(docs: org.apache.spark.sql.DataFrame, size: Int,
                  overlap: Int) =
    Chunking.chunkTokens(docs, "doc_id", "toks", size, overlap)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Int, Long, String)].collect().toSeq

  test("hand-computed: size 4 overlap 2 over 7 tokens") {
    // stride 2; starts while start <= max(1, 7-2)=5 → 1,3,5
    val got = run(toks((1L, "a b c d e f g")), size = 4, overlap = 2)
    assert(got == Seq(
      (1L, 0, 1, 4L, "a b c d"),
      (1L, 1, 3, 4L, "c d e f"),
      (1L, 2, 5, 3L, "e f g")))
  }

  test("doc shorter than size yields exactly one chunk (itself)") {
    val got = run(toks((1L, "a b"), (2L, "x")), size = 8, overlap = 3)
    assert(got == Seq((1L, 0, 1, 2L, "a b"), (2L, 0, 1, 1L, "x")))
  }

  test("exact multiple: no degenerate tail chunk") {
    // 6 tokens, size 4, stride 2: starts ≤ max(1, 6-2)=4 → 1,3 (not 5)
    val got = run(toks((1L, "a b c d e f")), size = 4, overlap = 2)
    assert(got.map(_._3) == Seq(1, 3))
    assert(got.last._5 == "c d e f")
  }

  test("zero overlap partitions the doc") {
    val got = run(toks((1L, "a b c d e")), size = 2, overlap = 0)
    assert(got.map(_._5) == Seq("a b", "c d", "e"))
    assert(got.map(_._4).sum == 5L)
  }

  test("chunking is a pure map: no exchange in the plan") {
    val df = Chunking.chunkTokens(toks((1L, "a b c d e")), "doc_id",
      "toks", 2, 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  // ---- content-defined chunking --------------------------------------

  private def runCdc(docs: org.apache.spark.sql.DataFrame, k: Int,
                     modulus: Int) =
    Chunking.chunkContentDefined(docs, "doc_id", "toks", k, modulus)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Int, Long, String)].collect().toSeq

  test("cdc: chunks tile the doc exactly, in order, from position 1") {
    val words = (1 to 200).map(i => s"w$i").mkString(" ")
    val got = runCdc(toks((1L, words)), k = 4, modulus = 8)
    assert(got.head._3 == 1, "first chunk must start at position 1")
    assert(got.map(_._4).sum == 200L, "chunk lengths must sum to doc length")
    // each chunk starts right after its predecessor ends
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 == a._3 + a._4)
      case _ => ()
    }
    assert(got.length > 1, "modulus=8 over 200 tokens must split")
  }

  test("cdc: boundaries are edit-stable (suffix chunks survive a prepend)") {
    // THE property fixed-stride chunking lacks: prepending a token can
    // only affect chunks up to the first surviving boundary — every
    // boundary after the edit selects on the same k-gram content, so
    // all later chunk fingerprints are unchanged
    val words = (1 to 300).map(i => s"w$i").mkString(" ")
    val a = runCdc(toks((1L, words)), k = 4, modulus = 8)
    val b = runCdc(toks((1L, "zedit " + words)), k = 4, modulus = 8)
    val bFps = b.map(_._5).toSet
    // all of A's chunks except (at most) its first must reappear in B
    val missing = a.drop(1).map(_._5).filterNot(bFps.contains)
    assert(missing.isEmpty,
      s"${missing.size} suffix chunks changed after a 1-token prepend")
    // B still tiles its (301-token) doc and its head chunk absorbed
    // the edit (starts with the new token, so it differs from A's head)
    assert(b.map(_._4).sum == 301L)
    assert(b.head._5 != a.head._5)
  }

  test("cdc: doc shorter than k yields one whole-doc chunk") {
    val got = runCdc(toks((1L, "a b"), (2L, "x")), k = 4, modulus = 8)
    assert(got.map(t => (t._1, t._3, t._4)) ==
      Seq((1L, 1, 2L), (2L, 1, 1L)))
  }

  test("cdc: pure map, no exchange") {
    val df = Chunking.chunkContentDefined(toks((1L, "a b c d e")),
      "doc_id", "toks", 4, 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
