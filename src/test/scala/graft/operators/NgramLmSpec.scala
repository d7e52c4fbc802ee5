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

  test("hand-computed Kneser-Ney scores (D = 0.75)") {
    // corpus: "a b" ×2, "a c" ×1, "b c" ×1
    // c2: (a,b)=2, (a,c)=1, (b,c)=1; c1: a=3, b=1
    // N1+(a,·)=2, N1+(b,·)=1; N1+(·,b)=1, N1+(·,c)=2; N1+(··)=3
    // P(b|a) = (2−.75)/3 + .75·2/3 · (1/3) = 1.25/3 + 0.5/3 ≈ 0.583333
    // P(c|a) = (1−.75)/3 + .75·2/3 · (2/3) = 0.25/3 + 1/3 = 1.25/3
    // P(c|b) = (1−.75)/1 + .75·1/1 · (2/3) = 0.25 + 0.5 = 0.75
    val docs = toks(Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b c"))
      .toDF("doc_id", "text"))
    val got = NgramLm.scoreBigramKn(docs, "doc_id", "toks")
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect().toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._2) == Seq(1L, 1L, 1L, 1L))
    val pBA = 1.25 / 3 + 0.75 * 2 / 3 * (1.0 / 3)
    val pCA = 0.25 / 3 + 0.75 * 2 / 3 * (2.0 / 3)
    val pCB = 0.25 + 0.75 * (2.0 / 3)
    assert(got(0)._3 == r6(math.log(pBA)) && got(1)._3 == r6(math.log(pBA)))
    assert(got(2)._3 == r6(math.log(pCA)))
    assert(got(3)._3 == r6(math.log(pCB)))
  }

  test("Kneser-Ney is a proper distribution: per-history mass over the vocab sums to 1") {
    // Σ_{w2 ∈ V} P(w2|w1) = [Σ_seen (c−D)]/c1 + D·N1+(w1,·)/c1 · Σ_V Pcont
    //                     = (c1 − D·N1+)/c1 + D·N1+/c1 = 1 exactly
    // (words never seen as a SECOND word carry Pcont = 0, so summing the
    // interpolated formula over the whole vocab is the seen-successor
    // discounted mass plus the full redistributed mass).
    val docs = toks(Seq(
      (1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"),
      (3L, "a cat and a dog"), (4L, "the mat and the rug")).toDF("doc_id", "text"))
    val bg = NgramLm.bigrams(docs, "doc_id", "toks")
    val c2 = bg.groupBy("w1", "w2").count().as[(String, String, Long)]
      .collect().map { case (a, b, c) => ((a, b), c) }.toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nAfter = c2.keys.groupBy(_._1).view.mapValues(_.size).toMap
    val nBefore = c2.keys.groupBy(_._2).view.mapValues(_.size).toMap
    val nTypes = c2.size.toDouble
    val vocab = c2.keys.flatMap(k => Seq(k._1, k._2)).toSet
    val d = 0.75
    for (w1 <- c1.keys) {
      val mass = vocab.toSeq.map { w2 =>
        val disc = math.max(c2.getOrElse((w1, w2), 0L) - d, 0.0) / c1(w1)
        val cont = d * nAfter(w1) / c1(w1) *
          (nBefore.getOrElse(w2, 0).toDouble / nTypes)
        disc + cont
      }.sum
      assert(math.abs(mass - 1.0) < 1e-12, s"history $w1 mass $mass")
    }
    // and the engine's per-instance probabilities agree with this replica
    val got = NgramLm.scoreBigramKn(docs, "doc_id", "toks")
      .select(col("doc_id"), col("avg_logprob"))
      .as[(Long, Double)].collect().toMap
    val expect = bg.as[(Long, String, String)].collect().toSeq
      .groupBy(_._1).view.mapValues { pairs =>
        val lps = pairs.map { case (_, w1, w2) =>
          math.log((c2((w1, w2)) - d) / c1(w1) +
            d * nAfter(w1) / c1(w1) * (nBefore(w2) / nTypes))
        }
        BigDecimal(lps.sum / lps.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    for ((id, lp) <- expect) assert(got(id) == lp, s"doc $id")
  }

  test("trigram KN matches a local replica and is a proper distribution") {
    val docs = toks(Seq(
      (1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"),
      (3L, "a cat and a dog sat"), (4L, "the mat and the rug sat"))
      .toDF("doc_id", "text")).filter(size(col("toks")) >= 3)
    val tg = NgramLm.trigrams(docs, "doc_id", "toks")
      .as[(Long, String, String, String)].collect().toSeq
    val c3 = tg.groupBy(t => (t._2, t._3, t._4)).view.mapValues(_.size).toMap
    val cHist = c3.groupBy(k => (k._1._1, k._1._2))
      .map { case (h, m) => h -> (m.values.sum, m.size) }
    val hat2 = c3.keys.groupBy(k => (k._2, k._3)).view.mapValues(_.size).toMap
    val den2 = hat2.groupBy(_._1._1)
      .map { case (w2, m) => w2 -> (m.values.sum, m.size) }
    val p1n = hat2.keys.groupBy(_._2).view.mapValues(_.size).toMap
    val nTypes = hat2.size.toDouble
    val d = 0.75
    def p2(w2: String, w3: String): Double = {
      val (dn, nf) = den2(w2)
      math.max(hat2.getOrElse((w2, w3), 0) - d, 0.0) / dn +
        d * nf / dn * (p1n.getOrElse(w3, 0) / nTypes)
    }
    def p3(w1: String, w2: String, w3: String): Double = {
      val (ch, nh) = cHist((w1, w2))
      math.max(c3.getOrElse((w1, w2, w3), 0) - d, 0.0) / ch +
        d * nh / ch * p2(w2, w3)
    }
    // proper distribution: for every seen history, Σ_vocab P₃ = 1
    val vocab = c3.keys.flatMap(k => Seq(k._1, k._2, k._3)).toSet
    for (h <- cHist.keys) {
      val mass = vocab.toSeq.map(w3 => p3(h._1, h._2, w3)).sum
      assert(math.abs(mass - 1.0) < 1e-12, s"history $h mass $mass")
    }
    // engine per-doc scores equal the replica
    val got = NgramLm.scoreTrigramKn(docs, "doc_id", "toks")
      .select(col("doc_id"), col("n_trigrams"), col("avg_logprob"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val expect = tg.groupBy(_._1).view.mapValues { ts =>
      val lps = ts.map(t => math.log(p3(t._2, t._3, t._4)))
      (ts.size.toLong, BigDecimal(lps.sum / lps.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(got == expect && got.nonEmpty)
  }

  test("bigram explode yields n-1 ordered pairs") {
    val docs = toks(Seq((1L, "w1 w2 w3 w4")).toDF("doc_id", "text"))
    val got = NgramLm.bigrams(docs, "doc_id", "toks")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "w1", "w2"), (1L, "w2", "w3"), (1L, "w3", "w4")))
  }
}
