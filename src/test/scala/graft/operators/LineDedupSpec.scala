package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 4 docs; "BOILER" appears in 3 distinct docs (twice in doc 1 — the
  // line-df counts DISTINCT docs, so in-doc repeats don't inflate it),
  // content lines are unique per doc.
  private val docs = Seq(
    (1L, "BOILER\nalpha one\nBOILER\nbravo two"),
    (2L, "BOILER\ncharlie three"),
    (3L, "delta four\nBOILER"),
    (4L, "echo five")
  ).toDF("doc_id", "text")

  test("lines above the doc-frequency threshold are removed everywhere") {
    val got = LineDedup.dropCommonLines(docs, "doc_id", "text", minDocFreq = 3L)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 2L, "alpha one\nbravo two"),
      (2L, 2L, 1L, "charlie three"),
      (3L, 2L, 1L, "delta four"),
      (4L, 1L, 0L, "echo five")))
  }

  test("below-threshold corpora pass through untouched") {
    val got = LineDedup.dropCommonLines(docs, "doc_id", "text", minDocFreq = 4L)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    // df("BOILER") = 3 distinct docs < 4 → nothing dropped, text intact
    assert(got.map(_._3).forall(_ == 0L))
    assert(got.map(r => (r._1, r._4)) ==
      Seq((1L, "BOILER\nalpha one\nBOILER\nbravo two"),
          (2L, "BOILER\ncharlie three"),
          (3L, "delta four\nBOILER"),
          (4L, "echo five")))
  }

  test("a fully-boilerplate document stays in the output with empty text") {
    val withEmpty = docs.union(Seq((5L, "BOILER")).toDF("doc_id", "text"))
    val got = LineDedup.dropCommonLines(withEmpty, "doc_id", "text", minDocFreq = 3L)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got.length == 5)
    assert(got.last == ((5L, 1L, 1L, "")))
  }

  test("in-doc repeats of a kept line survive with order preserved") {
    val rep = Seq((1L, "x\ny\nx"), (2L, "z")).toDF("doc_id", "text")
    val got = LineDedup.dropCommonLines(rep, "doc_id", "text", minDocFreq = 2L)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 3L, 0L, "x\ny\nx"), (2L, 1L, 0L, "z")))
  }
}
