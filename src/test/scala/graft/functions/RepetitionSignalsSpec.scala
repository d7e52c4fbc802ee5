package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Hand-computed values for the Gopher repetition-signal set
  * (Rae et al. 2021 Table A1) — [[RepetitionSignals.withSignals]].
  */
class RepetitionSignalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** All seven signals for one (lines, toks) document. */
  private def signals(lines: Seq[String], toks: Seq[String]): Seq[Double] = {
    val df = Seq((lines, toks)).toDF("lines", "toks")
    val r = RepetitionSignals.withSignals(df, "lines", "toks")
      .select("rep_dup_line_frac", "rep_dup_line_char_frac",
        "rep_top2_frac", "rep_top3_frac", "rep_top4_frac", "rep_dup5_frac",
        "rep_dup10_frac")
      .head()
    (0 until 7).map(r.getDouble)
  }

  test("dup line fraction and char fraction, hand computed") {
    // lines: ab(2), c, dddd(2) → 5 lines, 3 distinct → frac = 0.4
    // chars: 2+2+1+4+4 = 13; dup chars = 2+2+4+4 = 12
    val s = signals(Seq("ab", "c", "dddd", "ab", "dddd"), Seq("t", "u"))
    assert(math.abs(s(0) - 0.4) < 1e-12)
    assert(math.abs(s(1) - 12.0 / 13.0) < 1e-12)
  }

  test("no duplicate lines → both zero") {
    val s = signals(Seq("a", "b", "c"), Seq("t", "u"))
    assert(s(0) == 0.0 && s(1) == 0.0)
  }

  test("empty line set and short toks → all zero, not NaN/error") {
    val s = signals(Seq.empty, Seq.empty)
    assert(s == Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("dup 10-gram coverage, hand computed") {
    // T T w with T = t1..t10: 10-grams at 1..12; gram(1) = gram(11) = T
    // (the only duplicated value) → covered 1..10 ∪ 11..20 = 20 of 21
    // single-char positions
    val T = (1 to 10).map(i => ('a' + i - 1).toChar.toString)
    val s = signals(Seq("l"), T ++ T ++ Seq("w"))
    assert(math.abs(s(6) - 20.0 / 21.0) < 1e-12)
    // no duplicated 10-gram in a short doc
    assert(signals(Seq("l"), T)(6) == 0.0)
  }

  test("top bigram char fraction, hand computed") {
    // toks: x y x y z → bigrams: "x y"(2), "y x"(1), "y z"(1)
    // top = "x y": cnt 2 × 2 gram-chars = 4; total chars = 5
    val s = signals(Seq("l"), Seq("x", "y", "x", "y", "z"))
    assert(math.abs(s(2) - 4.0 / 5.0) < 1e-12)
  }

  test("top-gram tie breaks by char mass then lexicographic") {
    // bigrams "aa b"(1), "b cc"(1): tie on count; char masses aab=3 vs
    // bcc=3 → tie → lexicographically smallest gram "aa b" wins:
    // 1 × 3 = 3 of 5 total chars
    val s = signals(Seq("l"), Seq("aa", "b", "cc"))
    assert(math.abs(s(2) - 3.0 / 5.0) < 1e-12)
  }

  test("dup 5-gram coverage is overlap-aware (positions count once)") {
    // toks: a b c d e a b c d e a → 5-grams at 1..7; gram(1)=gram(6)
    // ("a b c d e") duplicated; also gram(2)=gram(7). Covered
    // positions: 1..10 ∪ 2..11 = all 11 → coverage exactly 1.0
    val s = signals(Seq("l"),
      Seq("a", "b", "c", "d", "e", "a", "b", "c", "d", "e", "a"))
    assert(s(5) == 1.0)
  }

  test("unique-gram doc has zero dup coverage") {
    val s = signals(Seq("l"), Seq("p", "q", "r", "s", "t", "u"))
    assert(s(5) == 0.0)
  }

  test("partial dup coverage, hand computed") {
    // toks: m n o p q m n o p q z z z z z z (16 toks)
    // 5-grams: positions 1..12; "m n o p q" at 1 and 6 (dup);
    // "z z z z z" at 11 and 12 (dup, same value); also grams 7..10
    // (n o p q z etc.) unique; gram 11="z z z z z", gram 12="z z z z z"
    // wait: positions 11..12 both give zzzzz → dup. dup starts:
    // {1, 6, 11, 12} → covered 1..10 ∪ 11..15 ∪ 12..16 = 1..16 → 1.0?
    // covered = 1..5∪6..10∪11..16 = all. Use 17th token 'w' to break:
    // append w → 17 toks, gram 13="z z z z w" unique... covered still
    // 1..16 of 17 → mass 16/17
    val s = signals(Seq("l"),
      Seq("m", "n", "o", "p", "q", "m", "n", "o", "p", "q",
          "z", "z", "z", "z", "z", "z", "w"))
    assert(math.abs(s(5) - 16.0 / 17.0) < 1e-12)
  }

  test("verdict applies Gopher thresholds in rule order") {
    val v = Seq(
      (0.4, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),   // dup_lines fires first
      (0.0, 0.3, 0.3, 0.0, 0.0, 0.0, 0.0),   // dup_line_chars before top2
      (0.0, 0.0, 0.0, 0.0, 0.0, 0.16, 0.2),  // dup_5gram before dup_10gram
      (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.11),  // dup_10gram
      (0.30, 0.20, 0.20, 0.18, 0.16, 0.15, 0.10)) // all AT thresholds → keep
      .toDF("a", "b", "c", "d", "e", "f", "g")
      .select(RepetitionSignals.repetitionVerdict(
        col("a"), col("b"), col("c"), col("d"), col("e"), col("f"),
        col("g")).as("v"))
      .as[String].collect().toSeq
    assert(v == Seq("dup_lines", "dup_line_chars", "dup_5gram",
      "dup_10gram", "keep"))
  }
}
