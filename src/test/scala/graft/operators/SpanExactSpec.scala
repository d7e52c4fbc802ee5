package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.TextFunctions

/** Over-removal of [[SpanDedup.removeDupSpans]] vs an EXACT recompute —
  * the VERDICT r11 #4 measurement. The reference implementation here is
  * deliberately independent of the operator's machinery: no md5, no
  * positioned-gram frames, no joins — a brute-force window scan that
  * compares token slices directly.
  *
  * Why the measured over-removal is exactly ZERO (and the spec pins
  * it): a token position lies inside a cross-doc duplicated substring
  * of length ≥ k iff it lies inside some duplicated k-window — any
  * length-L ≥ k duplicated substring contains L−k+1 duplicated
  * k-windows that jointly cover all L positions, and conversely a
  * duplicated k-window IS a duplicated substring of length ≥ k. Under
  * the operator's keeper convention (per-window keeper = min doc id
  * containing the window), the gram-union removal set therefore EQUALS
  * the exact duplicated-span removal set position-for-position; gram
  * granularity loses nothing. The previous scaladoc's "up to k−1
  * boundary tokens over-removed" was conservative documentation of a
  * bound that never binds.
  */
class SpanExactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Exact removal set: 1-based positions of doc `d` covered by some
    * k-window that occurs verbatim in ≥ 2 distinct docs with min
    * containing id ≠ d. Pure slice comparison, no hashing.
    */
  private def exactRemoved(docs: Seq[(Long, Vector[String])],
                           k: Int): Map[Long, Set[Int]] = {
    val removed = scala.collection.mutable.Map.empty[Long, Set[Int]]
      .withDefaultValue(Set.empty)
    for ((dId, dToks) <- docs; q <- 0 to dToks.length - k) {
      val w = dToks.slice(q, q + k)
      val containing = docs.filter { case (_, eToks) =>
        (0 to eToks.length - k).exists(r => eToks.slice(r, r + k) == w)
      }.map(_._1)
      if (containing.distinct.size >= 2 && containing.min != dId)
        removed(dId) = removed(dId) ++ (q + 1 to q + k)
    }
    removed.toMap
  }

  private def checkCorpus(rows: Seq[(Long, String)], k: Int): Long = {
    val docs = rows.toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    val got = SpanDedup.removeDupSpans(docs, "doc_id", "toks", k)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val toks = rows.map { case (id, t) =>
      (id, t.trim.split("\\s+").filter(_.nonEmpty).toVector)
    }
    val exact = exactRemoved(toks, k)
    var totalRemoved = 0L
    for ((id, tv) <- toks) {
      val ex = exact.getOrElse(id, Set.empty)
      val (nTok, nRem, clean) = got(id)
      assert(nTok == tv.length.toLong, s"doc $id n_tokens")
      assert(nRem == ex.size.toLong,
        s"doc $id: operator removed $nRem, exact removes ${ex.size} — " +
        s"over-removal must be zero")
      val expectClean = tv.zipWithIndex
        .collect { case (t, i) if !ex.contains(i + 1) => t }.mkString(" ")
      assert(clean == expectClean, s"doc $id clean_text")
      totalRemoved += nRem
    }
    totalRemoved
  }

  test("adversarial fixtures: gram removal == exact removal, token-exact") {
    // overlapping spans with different keepers, exact-length-k shares,
    // three-doc chains, keeper docs losing positions to smaller ids,
    // spans at doc boundaries, sub-k shares (no removal), clones
    val k = 3
    val rows = Seq(
      1L -> "a b c d e f g h",            // keeper of most windows
      2L -> "a b c d x y z",              // shares prefix with 1
      3L -> "z q a b c d e n m",          // interior share with 1 and 2
      4L -> "x y z a b c",                // tail share of 2, prefix share
      5L -> "p q r s t u v",              // unique — untouched
      6L -> "f g h p2 q2 e f g",          // boundary shares with 1
      7L -> "a b c d e f g h",            // exact clone of 1 — fully cut
      8L -> "m n o a b m n o",            // within-doc repeat only: sub-k
      9L -> "c d e f x2 c d e f")         // shares "c d e f" with 1, twice
    val total = checkCorpus(rows, k)
    assert(total > 0, "fixture must exercise real removal")
  }

  test("k at the doc-length edge and docs shorter than k pass through") {
    val rows = Seq(
      1L -> "a b c",      // exactly k tokens, shared
      2L -> "a b c",      // clone — removed entirely
      3L -> "a b",        // < k: no window, untouched
      4L -> "")           // empty
    checkCorpus(rows, 3)
  }

  test("real corpus slice: over-removal is zero on sf0.001 documents") {
    val rows = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 60).select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq
    // plant real cross-doc spans: each doc's tail is spliced into the
    // next doc's head so the slice has genuine duplicated mass
    val planted = rows.map { case (id, t) =>
      val prev = rows.find(_._1 == id - 1).map(_._2).getOrElse("")
      val splice = prev.trim.split("\\s+").filter(_.nonEmpty)
        .takeRight(8).mkString(" ")
      (id, if (id % 3 == 0 && splice.nonEmpty) s"$splice $t" else t)
    }
    val total = checkCorpus(planted, 5)
    assert(total > 0, "planted slice must have duplicated mass")
  }
}
