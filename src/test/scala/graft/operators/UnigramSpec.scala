package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[Unigram]] — SentencePiece-family unigram-LM tokenizer. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vocab = Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0,
    "c" -> -3.0)

  test("viterbi picks the max-likelihood segmentation, hand computed") {
    // "ab": ["ab"] scores -1 vs ["a","b"] -4
    assert(Unigram.viterbiLocal("ab", vocab) == Seq("ab"))
    // "abc": ["ab","c"] -4 beats ["a","b","c"] -7
    assert(Unigram.viterbiLocal("abc", vocab) == Seq("ab", "c"))
    // "ba" has no multi piece → chars
    assert(Unigram.viterbiLocal("ba", vocab) == Seq("b", "a"))
  }

  test("score ties prefer the longer piece") {
    // ["aa"] = -2 equals ["a","a"] = -2 → longer piece wins
    val v = Map("aa" -> -2.0, "a" -> -1.0)
    assert(Unigram.viterbiLocal("aa", v) == Seq("aa"))
  }

  test("unknown single codepoints fall back to unk, never fail") {
    assert(Unigram.viterbiLocal("xy", Map("x" -> -1.0)) == Seq("x", "y"))
    assert(Unigram.viterbiLocal("", vocab) == Seq.empty)
    // unk is per-codepoint: an astral char is ONE piece
    val astral = new String(Character.toChars(0x1F600))
    assert(Unigram.viterbiLocal(astral, Map.empty) == Seq(astral))
  }

  test("maxPieceLen bounds candidate pieces") {
    val v = Map("abcd" -> -0.5, "a" -> -2.0, "b" -> -2.0, "c" -> -2.0,
      "d" -> -2.0)
    assert(Unigram.viterbiLocal("abcd", v, maxPieceLen = 2) ==
      Seq("a", "b", "c", "d"))
    assert(Unigram.viterbiLocal("abcd", v, maxPieceLen = 4) == Seq("abcd"))
  }

  test("trainLocal is deterministic, keeps chars, respects vocabSize") {
    val words = Seq(("low", 5L), ("lower", 2L), ("lowest", 3L),
      ("newest", 4L), ("widest", 1L))
    val a = Unigram.trainLocal(words, vocabSize = 20)
    val b = Unigram.trainLocal(words, vocabSize = 20)
    assert(a == b, "same input must train the same vocab")
    val pieces = a.map(_._1).toSet
    val chars = words.flatMap(_._1.toSeq.map(_.toString)).toSet
    assert(chars.subsetOf(pieces), "single codepoints are unprunable")
    assert(a.size <= 20 || a.size == chars.size)
    assert(pieces.exists(_.length > 1), "some multi-char piece survives")
    // every trained word round-trips through its own vocab
    val m = a.toMap
    words.foreach { case (w, _) =>
      assert(Unigram.viterbiLocal(w, m).mkString == w)
    }
  }

  test("trainFast equals trainLocal on the same word table") {
    val words = Seq(("scan", 6L), ("can", 4L), ("join", 5L), ("hash", 3L))
    val docs = Seq(Tuple1(words.flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w) })).toDF("toks")
    assert(Unigram.trainFast(docs, "toks", vocabSize = 30) ==
      Unigram.trainLocal(words, vocabSize = 30))
  }

  test("trainFast caps the word table loudly") {
    val docs = Seq(Tuple1((1 to 100).map(i => s"w$i"))).toDF("toks")
    val e = intercept[IllegalArgumentException] {
      Unigram.trainFast(docs, "toks", vocabSize = 10, maxWords = 50)
    }
    assert(e.getMessage.contains("minFreq"))
  }

  test("lossPrune: deterministic, respects vocabSize, keeps chars, round-trips") {
    val words = Seq(("low", 5L), ("lower", 2L), ("lowest", 3L),
      ("newest", 4L), ("widest", 1L))
    val a = Unigram.trainLocal(words, vocabSize = 15, lossPrune = true)
    val b = Unigram.trainLocal(words, vocabSize = 15, lossPrune = true)
    assert(a == b, "loss-pruned training must be deterministic")
    val chars = words.flatMap(_._1.toSeq.map(_.toString)).toSet
    val pieces = a.map(_._1).toSet
    assert(chars.subsetOf(pieces), "single codepoints are unprunable")
    assert(a.size <= math.max(15, chars.size))
    val m = a.toMap
    words.foreach { case (w, _) =>
      assert(Unigram.viterbiLocal(w, m).mkString == w)
    }
  }

  test("lossPrune terminates when every multi piece must go (small-n clamp)") {
    // chars {a,b} already fill vocabSize=2 ⇒ targetMulti=0; ceil(1×0.75)=1
    // would loop forever without the ≥1-removal clamp
    val out = Unigram.trainLocal(Seq(("ab", 3L)), vocabSize = 2,
      lossPrune = true)
    assert(out.map(_._1).toSet == Set("a", "b"))
  }

  test("lossPrune keeps the higher-loss piece usage-rank parity would tie on") {
    // "ababab"×9 segments as [aba|bab] or via "ab": the survivor must be
    // the piece whose REMOVAL costs the most corpus likelihood, and the
    // final vocab still round-trips every word
    val words = Seq(("ababab", 9L), ("ab", 6L))
    val out = Unigram.trainLocal(words, vocabSize = 4, lossPrune = true)
    val m = out.toMap
    words.foreach { case (w, _) =>
      assert(Unigram.viterbiLocal(w, m).mkString == w)
    }
    assert(out.size <= 4 || out.size == 2)
  }

  test("alpha smoothing changes scores, not coverage") {
    val words = Seq(("scan", 6L), ("can", 4L), ("join", 5L))
    val plain = Unigram.trainLocal(words, vocabSize = 20)
    val smoothed = Unigram.trainLocal(words, vocabSize = 20, alpha = 1.0)
    assert(plain.map(_._1) == smoothed.map(_._1),
      "add-α must not change which pieces survive at fixed usage ranks")
    assert(plain != smoothed, "α=1 must move the log-probs")
    // smoothing shrinks the spread: rare pieces gain, frequent lose
    val (pm, sm) = (plain.toMap, smoothed.toMap)
    val spread = (v: Map[String, Double]) => v.values.max - v.values.min
    assert(spread(sm) <= spread(pm) + 1e-12)
    words.foreach { case (w, _) =>
      assert(Unigram.viterbiLocal(w, sm).mkString == w)
    }
  }

  test("unigram_encode rejects non-numeric literals with a clear message") {
    graft.plans.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql(
        """SELECT unigram_encode('ab',
             array(struct('ab', -1.0d)), 'eight') AS p""").collect()
    }
    assert(e.getMessage.contains("maxPieceLen") ||
      Option(e.getCause).exists(_.getMessage.contains("maxPieceLen")))
  }

  test("unigram_encode coerces bigint/int literals (SQL literal types)") {
    graft.plans.GraftFunctions.register(spark)
    // 8L arrives as bigint, -100 as int — both must coerce, not CCE
    val r = spark.sql(
      """SELECT unigram_encode('ab',
           array(struct('ab', -1.0d), struct('a', -2.0d),
                 struct('b', -2.0d)), 8L, -100) AS p""")
      .as[Seq[String]].head()
    assert(r == Seq("ab"))
  }

  test("unigram_encode expression matches viterbiLocal through codegen") {
    graft.plans.GraftFunctions.register(spark)
    val trained = Unigram.trainLocal(
      Seq(("scan", 6L), ("can", 4L), ("join", 5L), ("scatter", 1L)),
      vocabSize = 25)
    val words = Seq("scan", "scans", "junction", "zzz", "cancan")
    val got = words.toDF("w")
      .select(graft.functions.UnigramEncode
        .unigram_encode(col("w"), trained).as("p"))
      .as[Seq[String]].collect().toSeq
    val want = words.map(w => Unigram.viterbiLocal(w, trained.toMap))
    assert(got == want)
  }

  test("unigram_encode is SQL-registered") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT unigram_encode('ab',
           array(struct('ab', -1.0d), struct('a', -2.0d),
                 struct('b', -2.0d))) AS p""")
      .as[Seq[String]].head()
    assert(r == Seq("ab"))
  }
}
