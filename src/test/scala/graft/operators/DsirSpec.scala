package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("toks"))

  test("hashedNgrams: n_features = 2·len − 1, buckets in range") {
    val f = Dsir.hashedNgrams(docs((1L, "a b c"), (2L, "x")),
        "id", "toks", numBuckets = 16)
      .groupBy("id").agg(count(lit(1)).as("n"),
        max(col("bucket")).as("mx"), min(col("bucket")).as("mn"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(f(1L)._2 == 5) // 3 unigrams + 2 bigrams
    assert(f(2L)._2 == 1) // 1 unigram, no bigram
    assert(f.values.forall(r => r._3 < 16 && r._4 >= 0))
  }

  // Target mass must be comparable to numBuckets or add-one smoothing
  // flattens every bucket toward 1/B and the llr signal drowns — the
  // production regime is n_features >> B (DSIR fits millions of
  // features into ~1e4 buckets), so the fixtures repeat the target
  // vocabulary to get there.
  private val wikiTarget = ("wiki1 wiki2 wiki3 " * 10).trim

  test("importance weights rank target-like docs above off-target docs") {
    // target vocabulary {wiki*}, off-target {spam*}; a raw doc written
    // in target vocab must out-weigh one written in neither and one in
    // anti-target vocab present in raw only
    val raw = docs(
      (1L, ("wiki1 wiki2 wiki3 " * 5).trim),
      (2L, ("spam1 spam2 spam3 " * 5).trim),
      (3L, ("wiki1 spam1 wiki2 spam2 wiki3 " * 3).trim))
    val target = docs((10L, wikiTarget))
    val w = Dsir.importanceWeights(raw, target, "id", "toks",
        numBuckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L),
      s"expected wiki > mixed > spam, got $w")
    assert(w(1L) > 0 && w(2L) < 0)
  }

  test("resampleTopK: deterministic, k rows, honors weight ordering") {
    val raw = docs((1L to 40L).map(i =>
      (i, if (i <= 5) "wiki1 wiki2 wiki3" else s"junk${i}a junk${i}b junk${i}c"): (Long, String)): _*)
    val target = docs((100L, wikiTarget))
    val w = Dsir.importanceWeights(raw, target, "id", "toks", numBuckets = 64)
    val a = Dsir.resampleTopK(w, "id", "log_weight", k = 5)
      .select("id").as[Long].collect().toSet
    val b = Dsir.resampleTopK(w, "id", "log_weight", k = 5)
      .select("id").as[Long].collect().toSet
    assert(a == b, "content-keyed noise must be replayable")
    assert(a.size == 5)
    // the five target-vocab docs dominate: gumbel noise is O(1) while
    // the weight gap is log-likelihood over 5 matching features
    assert((1L to 5L).toSet.intersect(a).size >= 3)
  }
}
