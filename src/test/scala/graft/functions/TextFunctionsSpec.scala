package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tokens: whitespace split, empties dropped") {
    val got = Seq("  the  quick   fox ", "", "one")
      .toDF("t").select(TextFunctions.tokens($"t")).as[Seq[String]].collect()
    assert(got(0) == Seq("the", "quick", "fox"))
    assert(got(1) == Seq())
    assert(got(2) == Seq("one"))
  }

  test("bpeish token count: words, numbers, symbols") {
    val got = Seq("hello world42!", "a-b c")
      .toDF("t").select(TextFunctions.bpeishTokenCount($"t")).as[Long].collect()
    assert(got(0) == 4)  // hello, world, 42, !
    assert(got(1) == 4)  // a, -, b, c
  }

  test("stopwordRatio: hand-computed") {
    val got = Seq("the cat and the dog", "cat dog", "")
      .toDF("t")
      .select(TextFunctions.stopwordRatio(TextFunctions.tokens($"t")))
      .as[Double].collect()
    assert(math.abs(got(0) - 0.6) < 1e-12)  // the, and, the of 5
    assert(got(1) == 0.0)
    assert(got(2) == 0.0)
  }

  test("langId picks the dominant stopword language, 'und' when none") {
    val got = Seq(
      "the cat is in the house and it is warm",
      "el gato y la casa de un una que en los",
      "zzz qqq www").toDF("t")
      .select(TextFunctions.langId($"t")).as[String].collect()
    assert(got.toSeq == Seq("en", "es", "und"))
  }

  test("fingerprints: content_fp is order-insensitive, exact_fp is not") {
    val df = Seq("a b c", "c b a", "a b c").toDF("t").select(
      TextFunctions.exactFingerprint($"t").as("e"),
      TextFunctions.contentFingerprint($"t").as("c"))
    val rows = df.collect()
    assert(rows(0).getString(1) == rows(1).getString(1))  // same content fp
    assert(rows(0).getString(0) != rows(1).getString(0))  // different exact fp
    assert(rows(0).getString(0) == rows(2).getString(0))
  }

  test("qualityScore bounded in [0,1] and favors stopword-rich prose") {
    val got = Seq(
      "the cat and the dog in a house of it that is the story",
      "zzz qqq",
      "!!! ??? ...").toDF("t")
      .select(TextFunctions.qualityScore($"t")).as[Double].collect()
    got.foreach(q => assert(q >= 0.0 && q <= 1.0))
    assert(got(0) > got(1), "prose should outscore junk")
    assert(got(0) > got(2), "prose should outscore punctuation soup")
  }

  test("charEntropy: hand-computed distributions") {
    // "aabb": two symbols at p=1/2 → exactly 1 bit/char
    // "abcd": four at p=1/4 → exactly 2; "aaaa": one symbol → 0
    // "aab": log2(3) - (2·log2 2 + 1·0)/3 = log2 3 - 2/3
    val got = Seq("aabb", "abcd", "aaaa", "aab", "")
      .toDF("t").select(TextFunctions.charEntropy($"t")).as[Double].collect()
    assert(got(0) == 1.0 && got(1) == 2.0 && got(2) == 0.0)
    assert(math.abs(got(3) - (math.log(3) / math.log(2) - 2.0 / 3.0)) < 1e-12)
    assert(got(4) == 0.0)
  }

  test("charEntropy flags ababab-degenerate docs prose-level repetition misses") {
    val got = Seq("ab" * 100, "the quick brown fox jumps over the lazy dog")
      .toDF("t").select(TextFunctions.charEntropy($"t")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) > 3.0, s"natural prose should exceed 3 bits/char, got ${got(1)}")
  }
}
