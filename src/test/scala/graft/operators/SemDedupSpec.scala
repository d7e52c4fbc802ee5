package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  test("hand-computed: exact and near clones drop, lower id kept") {
    // cell = signs of first 2 dims; ids 1,2,3 share cell 3
    // id2 ≡ id1 (cos 1), id3 ≈ id1 (cos ≈ 0.9975) → both drop
    // ids 4,5 are alone in their cells → kept
    val got = SemDedup.semanticDedup(frame(
        (1L, Seq(1.0, 1.0, 0.0, 0.0)),
        (2L, Seq(1.0, 1.0, 0.0, 0.0)),
        (3L, Seq(1.0, 1.0, 0.1, 0.0)),
        (4L, Seq(-1.0, 1.0, 0.0, 0.0)),
        (5L, Seq(1.0, -1.0, 0.0, 0.0))),
      "vec_id", "embedding", signBits = 2, tau = 0.95)
      .orderBy("vec_id")
      .as[(Long, Int, Boolean)].collect().toSeq
    assert(got.map(_._3) == Seq(false, true, true, false, false))
    assert(got.map(_._2) == Seq(3, 3, 3, 2, 1))
  }

  test("dissimilar same-cell items both survive") {
    // same sign cell but cosine ≈ 0.0909 < tau
    val got = SemDedup.semanticDedup(frame(
        (1L, Seq(1.0, 0.1, 1.0, 0.0)),
        (2L, Seq(1.0, 0.1, -1.0, 0.0))),
      "vec_id", "embedding", signBits = 2, tau = 0.95)
      .orderBy("vec_id").as[(Long, Int, Boolean)].collect().toSeq
    assert(got.map(_._3) == Seq(false, false))
  }

  test("production path: ivfAssign k-means cells feed semanticDedupInCells") {
    // real embeddings + a planted exact clone; the clone lands in its
    // source's IVF cell by construction (identical vector → identical
    // nearest centroid) and must drop
    val base = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val clone = base.filter(org.apache.spark.sql.functions.col("vec_id") === 7L)
      .select(org.apache.spark.sql.functions.lit(999999L).as("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val cells = Similarity.ivfAssign(base.unionByName(clone), nCells = 8)
    val got = SemDedup.semanticDedupInCells(
        cells, "ivf_id", "ivf_v", "cell", tau = 0.95, maxCell = 10000L)
      .as[(Long, Long, Boolean)].collect().map { case (id, _, d) => (id, d) }.toMap
    assert(got(999999L) == true, "planted clone must drop in its IVF cell")
    assert(got(7L) == false, "lower-id source must be kept")
  }

  test("maxCell guard binds conservative: oversized cell keeps everything") {
    val rows = (1L to 5L).map(i => (i, Seq(1.0, 1.0, 0.0, 0.0)))
    val strict = SemDedup.semanticDedup(frame(rows: _*),
      "vec_id", "embedding", signBits = 2, tau = 0.95, maxCell = 2L)
      .orderBy("vec_id").as[(Long, Int, Boolean)].collect().toSeq
    assert(strict.map(_._3).forall(_ == false),
      "identical members of an over-cap cell must ALL be kept (recall loss, not precision loss)")
    val loose = SemDedup.semanticDedup(frame(rows: _*),
      "vec_id", "embedding", signBits = 2, tau = 0.95)
      .orderBy("vec_id").as[(Long, Int, Boolean)].collect().toSeq
    assert(loose.map(_._3) == Seq(false, true, true, true, true))
  }
}
