package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.TextFunctions

class NgramLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toks(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)

  test("hand-computed add-one bigram scores") {
    // corpus: "a b" ×2 and "a c" ×1 → V = {a,b,c} = 3
    // c2(a,b)=2, c2(a,c)=1, c1(a)=3
    // doc1/doc2 lp = ln((2+1)/(3+3)) = ln(0.5); doc3 lp = ln((1+1)/(3+3)) = ln(1/3)
    val docs = toks(Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text"))
    val got = NgramLm.scoreBigramLm(docs, "doc_id", "toks")
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect().toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._2) == Seq(1L, 1L, 1L))
    assert(got(0)._3 == r6(math.log(0.5)) && got(1)._3 == r6(math.log(0.5)))
    assert(got(2)._3 == r6(math.log(1.0 / 3.0)))
    assert(got(0)._4 == r6(1.0 / 0.5) && got(2)._4 == r6(3.0))
  }

  test("fluent text under the corpus model outscores shuffled gibberish") {
    // 20 docs repeat the same sentence (high-probability bigrams); one
    // doc uses the same words in a never-seen order.
    val fluent = (1L to 20L).map(i => (i, "the cat sat on the mat"))
    val odd = Seq((99L, "mat the on sat cat the"))
    val docs = toks((fluent ++ odd).toDF("doc_id", "text"))
    val got = NgramLm.scoreBigramLm(docs, "doc_id", "toks")
      .select(col("doc_id"), col("ppl")).as[(Long, Double)].collect().toMap
    assert(got(1L) < got(99L), s"fluent ppl ${got(1L)} should beat gibberish ${got(99L)}")
  }

  test("bigram explode yields n-1 ordered pairs") {
    val docs = toks(Seq((1L, "w1 w2 w3 w4")).toDF("doc_id", "text"))
    val got = NgramLm.bigrams(docs, "doc_id", "toks")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "w1", "w2"), (1L, "w2", "w3"), (1L, "w3", "w4")))
  }
}
