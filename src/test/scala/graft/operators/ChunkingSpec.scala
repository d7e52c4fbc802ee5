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
}
