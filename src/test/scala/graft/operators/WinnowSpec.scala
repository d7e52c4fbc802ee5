package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toks(pairs: (Long, String)*) =
    pairs.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))

  private def fps(docs: org.apache.spark.sql.DataFrame, k: Int, w: Int) =
    Winnow.fingerprints(docs, "doc_id", "toks", k, w)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("gram/window counts and determinism") {
    // 10 tokens, k=3 → 8 grams; w=4 → 5 windows, ≤5 distinct minima
    val d = toks((1L, "a b c d e f g h i j"))
    val a = fps(d, k = 3, w = 4)
    assert(a.head._2 == 8L)
    assert(a.head._3 >= 1L && a.head._3 <= 5L)
    assert(fps(d, k = 3, w = 4) == a, "content-keyed: replayable")
  }

  test("winnowing guarantee: shared run of >= w+k-1 tokens shares a fingerprint") {
    // identical 8-token run (w+k-1 = 4+3-1 = 6 needed) inside unrelated
    // contexts — the papers' coverage property: at least one window min
    // is selected from inside the shared run in BOTH docs
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val d = toks(
      (1L, s"p1 p2 p3 $shared q1 q2"),
      (2L, s"r1 $shared t1 t2 t3 t4"))
    val sets = Winnow.fingerprints(d, "doc_id", "toks", k = 3, w = 4)
    // recompute the selected VALUE sets to intersect them
    val vals = d
      .select(col("doc_id"), transform(
        sequence(lit(1), size(col("toks")) - 2),
        i => conv(substring(md5(concat_ws(" ",
          slice(col("toks"), i, lit(3)))), 1, 8), 16, 10).cast("long"))
        .as("gh"))
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(1), greatest(lit(1), size(col("gh")) - 3)),
        p => array_min(slice(col("gh"), p, lit(4))))).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(vals(1L).toSet.intersect(vals(2L).toSet).nonEmpty,
      "shared run must contribute a shared fingerprint")
    // and docs with no shared content share nothing
    val d2 = toks((1L, "a1 a2 a3 a4 a5 a6 a7"), (2L, "b1 b2 b3 b4 b5 b6 b7"))
    val v2 = d2
      .select(col("doc_id"), transform(
        sequence(lit(1), size(col("toks")) - 2),
        i => conv(substring(md5(concat_ws(" ",
          slice(col("toks"), i, lit(3)))), 1, 8), 16, 10).cast("long"))
        .as("gh"))
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(1), greatest(lit(1), size(col("gh")) - 3)),
        p => array_min(slice(col("gh"), p, lit(4))))).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(v2(1L).toSet.intersect(v2(2L).toSet).isEmpty)
    assert(sets.count() == 2)
  }

  test("docs shorter than k are excluded; k-length doc gets one gram") {
    val got = fps(toks((1L, "a b"), (2L, "a b c")), k = 3, w = 4)
    assert(got.map(_._1) == Seq(2L))
    assert(got.head._2 == 1L && got.head._3 == 1L)
  }

  test("sharedFingerprintPairs: shared-run pair found, disjoint docs not paired") {
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val d = toks(
      (1L, s"p1 p2 p3 $shared q1 q2"),
      (2L, s"r1 $shared t1 t2 t3 t4"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"))
    val got = Winnow.sharedFingerprintPairs(d, "doc_id", "toks",
        k = 3, w = 4, minShared = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(got.head._3 >= 1L)
  }

  test("sharedFingerprintPairs: maxBucket guard drops boilerplate fingerprints") {
    // the same text in 5 docs; maxBucket=4 < 5 drops every shared
    // fingerprint bucket → no pairs survive (the documented skew trade)
    val d = toks((1L to 5L).map(i => (i, "c1 c2 c3 c4 c5 c6 c7 c8")): _*)
    // clones are the deliberate fixture here → opt out of the dedup guard
    val capped = Winnow.sharedFingerprintPairs(d, "doc_id", "toks",
      k = 3, w = 4, minShared = 1, maxBucket = 4L, requireDeduped = false)
    assert(capped.count() == 0L)
    val uncapped = Winnow.sharedFingerprintPairs(d, "doc_id", "toks",
      k = 3, w = 4, minShared = 1, maxBucket = 200L, requireDeduped = false)
    assert(uncapped.count() == 10L, "C(5,2) pairs when the cap clears")
  }

  test("exact-dedup precondition is enforced: cloned corpus trips the guard") {
    // 3 copies of each of 40 distinct docs — every clone group sits BELOW
    // maxBucket, exactly where the bucket cap cannot help; the probe must
    // throw before any bucket explosion is planned
    val cloned = toks((for {
      base <- 1L to 40L; copy <- 0L to 2L
    } yield (base * 10 + copy, s"w${base}a w${base}b w${base}c w${base}d " +
        s"w${base}e w${base}f w${base}g w${base}h")): _*)
    val e = intercept[IllegalArgumentException] {
      Winnow.sharedFingerprintPairs(cloned, "doc_id", "toks", k = 3, w = 4)
    }
    assert(e.getMessage.contains("exact dedup"), e.getMessage)
    // the same corpus after exact dedup (distinct token streams) passes
    val deduped = cloned.dropDuplicates("toks")
    assert(Winnow.sharedFingerprintPairs(deduped, "doc_id", "toks",
      k = 3, w = 4, minShared = 1).count() == 0L)
    // and requireDeduped = false is an explicit escape hatch
    assert(Winnow.sharedFingerprintPairs(cloned, "doc_id", "toks",
      k = 3, w = 4, minShared = 1, requireDeduped = false).count() == 120L)
  }

  test("sharedFingerprintPairs: single-scan plan — no join operator") {
    // pair generation is in-row from the per-fingerprint bucket array,
    // so the plan must contain NO join (the equi-self-join alternative
    // plans the fingerprint pipeline four times)
    val d = toks((1L, "a b c d e f"), (2L, "a b c d e g"))
    val plan = Winnow.sharedFingerprintPairs(d, "doc_id", "toks", 3, 4,
      minShared = 1).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("selection is in-row: no exchange in the plan") {
    val df = Winnow.fingerprints(toks((1L, "a b c d e")), "doc_id",
      "toks", 3, 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
