package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def corpus = graft.Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding")
  private def queries = corpus.filter($"vec_id" < 3)
    .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))

  test("seedCodebooks: m·ksub rows, dsub-wide, codes 0..ksub-1") {
    val cb = Pq.seedCodebooks(corpus, m = 8, ksub = 16).collect()
    assert(cb.length == 8 * 16)
    assert(cb.forall(_.getAs[Seq[Double]]("cv").length == 8))
    val codes = cb.map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(codes == (for (s <- 0 until 8; c <- 0 until 16) yield (s, c)).toSet)
  }

  test("encode: first-ksub vectors quantize losslessly (qerr == 0)") {
    val cb = Pq.seedCodebooks(corpus, m = 8, ksub = 16)
    val enc = Pq.encode(corpus.filter($"vec_id" < 16), cb, m = 8).collect()
    assert(enc.length == 16)
    // a codebook-source vector's own subvectors are IN the codebook, so
    // its distance-0 argmin must pick itself in every subspace
    enc.foreach { r =>
      val id = r.getLong(0)
      val codes = r.getSeq[Int](1).toList
      assert(codes == List.fill(8)(id.toInt), s"vec $id codes $codes")
      assert(r.getDouble(2) == 0.0, s"vec $id qerr ${r.getDouble(2)}")
    }
  }

  test("lossless corpus: full-probe IVF-PQ ADC equals exact cosine ranks") {
    // corpus whose every vector IS a codebook source vector (replicated
    // under new ids): quantization is exact, so ADC == cosine and the
    // full-probe top-k must match brute force rank-for-rank
    val base = corpus.filter($"vec_id" < 16)
    val replicated = base.unionByName(
      base.select(($"vec_id" + 100L).as("vec_id"), $"embedding"))
    val qs = base.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val exact = Similarity.bruteForceTopK(replicated, qs, k = 5)
      .orderBy("query_id", "rank")
      .select("query_id", "rank", "neighbor_id").collect().map(_.toSeq).toSeq
    val pq = Pq.ivfPqTopK(replicated, qs, k = 5, nCells = 8, nProbe = 8,
        m = 8, ksub = 16)
      .orderBy("query_id", "rank")
      .select("query_id", "rank", "neighbor_id").collect().map(_.toSeq).toSeq
    assert(pq == exact, "lossless PQ must reproduce the exact ranking")
    // and the ADC score of an exact-clone neighbor is the true cosine 1
    val cloneRows = Pq.ivfPqTopK(replicated, qs, k = 5, nCells = 8,
        nProbe = 8, m = 8, ksub = 16)
      .filter($"neighbor_id" === $"query_id" + 100L).collect()
    assert(cloneRows.nonEmpty)
    cloneRows.foreach(r => assert(math.abs(r.getDouble(3) - 1.0) < 1e-6))
  }

  test("trainCodebooks: Lloyd objective is non-increasing and improves") {
    val (cb, hist) = Pq.trainCodebooks(corpus, m = 8, ksub = 16, maxIter = 4)
    assert(cb.count() == 8 * 16)
    assert(hist.nonEmpty)
    hist.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"objective rose: $a -> $b")
      case _         =>
    }
    assert(hist.last <= hist.head + 1e-9)
  }

  test("trained codebooks quantize no worse than seed codebooks") {
    val seedErr = Pq.encode(corpus,
        Pq.seedCodebooks(corpus, m = 8, ksub = 16), m = 8)
      .agg(sum($"qerr")).head().getDouble(0)
    val (trained, _) = Pq.trainCodebooks(corpus, m = 8, ksub = 16, maxIter = 3)
    val trainedErr = Pq.encode(corpus, trained, m = 8)
      .agg(sum($"qerr")).head().getDouble(0)
    assert(trainedErr <= seedErr + 1e-9,
      s"training worsened quantization: $seedErr -> $trainedErr")
  }

  test("ivfPqTopK recall@5 vs brute force at the operating point") {
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // m = 16 (dsub = 4) at this 50-vector scale: finer quantization is
    // what recovers recall when the codebooks have only 50 training
    // points (measured: m=8 ≈ 0.27–0.47 across configs, m=16 ≈ 0.6 at
    // nProbe=4). Chance overlap for k=5 of ~49 candidates is ≈ 0.10;
    // the floor is set well above chance but tolerant of testdata
    // regeneration. Exact geometry is pinned by the lossless test.
    val pq = Pq.ivfPqTopK(corpus, queries, k = 5, nCells = 8, nProbe = 4,
        m = 16, ksub = 16, trainIters = 3)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect pq).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@5 $recall below floor")
  }

  test("encode output is m one-byte-range codes (the 64x memory point)") {
    val enc = Pq.encode(corpus, Pq.seedCodebooks(corpus, m = 8, ksub = 16),
      m = 8)
    val bad = enc.filter(exists($"codes", c => c < 0 || c > 255)).count()
    assert(bad == 0)
    assert(enc.select(max(size($"codes"))).head().getInt(0) == 8)
  }
}
