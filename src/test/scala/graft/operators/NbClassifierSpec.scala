package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.TextFunctions

class NbClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toks(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("y"),
        TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed add-one NB log-odds") {
    // corpus: d1(y=0)="a b", d2(y=0)="a", d3(y=1)="b c"
    // V=3, n0=3, n1=2, d0=2, d1=1
    // wc: a(2,0) b(1,1) c(0,1)
    // d1: s0=ln(3/6)+ln(2/6)=ln(1/6); s1=ln(1/5)+ln(2/5)=ln(2/25)
    //     lo = ln(1/2) + ln(2/25) - ln(1/6) = ln(0.24)
    // d2: lo = ln(1/2) + ln(1/5) - ln(3/6) = ln(0.2)
    // d3: s0=ln(2/6)+ln(1/6)=ln(1/18); s1=ln(2/5)+ln(2/5)=ln(4/25)
    //     lo = ln(1/2) + ln(4/25) - ln(1/18) = ln(1.44)
    val docs = toks(Seq((1L, 0, "a b"), (2L, 0, "a"), (3L, 1, "b c"))
      .toDF("doc_id", "y", "text"))
    val got = NbClassifier.trainScoreBinary(docs, "doc_id", "toks", "y")
      .orderBy("doc_id").as[(Long, Int, Long, Double, Int)].collect().toSeq
    assert(got.map(_._3) == Seq(2L, 1L, 2L))
    assert(got(0)._4 == r6(math.log(0.24)))
    assert(got(1)._4 == r6(math.log(0.2)))
    assert(got(2)._4 == r6(math.log(1.44)))
    assert(got.map(_._5) == Seq(0, 0, 1))
  }

  test("class-marker corpus classifies to the planted label") {
    // Shared filler both classes see equally, plus one class-specific
    // marker per doc: every doc's log-odds must side with its marker.
    val docs = toks((1L to 40L).map { i =>
      val y = (i % 2).toInt
      (i, y, s"common filler words mk$y mk$y")
    }.toDF("doc_id", "y", "text"))
    val got = NbClassifier.trainScoreBinary(docs, "doc_id", "toks", "y")
      .select(col("y"), col("pred_label")).as[(Int, Int)].collect().toSeq
    assert(got.size == 40 && got.forall { case (y, p) => y == p })
  }

  test("a class-unseen token is smoothed, not dropped or infinite") {
    // "z" appears only in class 1; class-0 docs containing it still
    // score finitely (c0=0 → add-one floor 1/(n0+V)).
    val docs = toks(Seq((1L, 0, "a z"), (2L, 0, "a"), (3L, 1, "z z b"))
      .toDF("doc_id", "y", "text"))
    val got = NbClassifier.trainScoreBinary(docs, "doc_id", "toks", "y")
      .as[(Long, Int, Long, Double, Int)].collect()
    assert(got.length == 3 && got.forall(r => !r._4.isNaN && !r._4.isInfinite))
  }
}
