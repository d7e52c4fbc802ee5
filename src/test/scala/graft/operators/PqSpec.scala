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

  test("isotropic corpus: residuals EXCEED unit norm; raw seed wins (pinned)") {
    // The conditional the Jégou construction actually carries: residual
    // PQ helps iff the coarse quantizer explains variance. On this
    // synthetic corpus embeddings are near-isotropic — the best of 16
    // centroids has cosine ≈ 0.25, so ‖r‖² = 2 − 2cos ≈ 1.5 > ‖nv‖² = 1
    // and the residual codebook faces MORE mass than the raw one.
    // Pinned so the geometry stays measured, not assumed (measured at
    // seed geometry m=8/ksub=16/nCells=16: raw 376, res 520).
    val meanR2 = Pq.residualFrames(corpus, nCells = 16)
      .select(aggregate($"rv", lit(0.0), (a, x) => a + x * x).as("r2"))
      .agg(avg($"r2")).head().getDouble(0)
    assert(meanR2 > 1.0,
      s"isotropic fixture should have super-unit residuals, got $meanR2")
    val rawErr = Pq.encode(corpus,
        Pq.seedCodebooks(corpus, m = 8, ksub = 16), m = 8)
      .agg(sum($"qerr")).head().getDouble(0)
    val resErr = Pq.encodeResidual(corpus,
        Pq.seedResidualCodebooks(corpus, m = 8, ksub = 16, nCells = 16),
        m = 8, nCells = 16)
      .agg(sum($"qerr")).head().getDouble(0)
    assert(rawErr < resErr,
      s"on isotropic data raw should encode tighter: raw $rawErr res $resErr")
  }

  test("clustered corpus: residual encoding quantizes >=10x tighter") {
    // The regime residual PQ exists for: tight clusters around the
    // cells. Members = center(i%8) + 0.02·(i%7)·u — within-cluster
    // variation lives on a SHARED direction, so residuals are near-
    // collinear across clusters and the residual codebook pools all 16
    // codewords on that line, while raw codewords must also encode
    // cluster identity. Measured 29x at this geometry; floor at 10x.
    val centers = corpus.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), Similarity.asDouble($"embedding").as("cv"))
    val u = corpus.filter($"vec_id" === 40)
      .select(Similarity.asDouble($"embedding").as("uv"))
    val members = corpus.filter($"vec_id" >= 8 && $"vec_id" < 208)
      .select($"vec_id", ($"vec_id" % 8).as("cid"),
        ($"vec_id" % 7).cast("double").as("t"))
      .join(centers, "cid").crossJoin(u)
      .select($"vec_id",
        zip_with($"cv", $"uv", (c, uu) => c + $"t" * lit(0.02) * uu)
          .as("embedding"))
    val clustered = centers.select($"cid".as("vec_id"), $"cv".as("embedding"))
      .unionByName(members)
    val meanR2 = Pq.residualFrames(clustered, nCells = 8)
      .select(aggregate($"rv", lit(0.0), (a, x) => a + x * x).as("r2"))
      .agg(avg($"r2")).head().getDouble(0)
    assert(meanR2 < 0.1,
      s"clustered fixture should have small residuals, got $meanR2")
    val rawErr = Pq.encode(clustered,
        Pq.seedCodebooks(clustered, m = 8, ksub = 16), m = 8)
      .agg(sum($"qerr")).head().getDouble(0)
    val resErr = Pq.encodeResidual(clustered,
        Pq.seedResidualCodebooks(clustered, m = 8, ksub = 16, nCells = 8),
        m = 8, nCells = 8)
      .agg(sum($"qerr")).head().getDouble(0)
    assert(resErr * 10 < rawErr,
      s"residual should win >=10x on clustered data: raw $rawErr res $resErr")
  }

  test("residual lossless clones: clone ADC equals the exact cosine") {
    // plant exact clones of the residual codebook-source ids
    // [nCells, nCells+ksub): a clone shares its source's cell and
    // residual, the residual IS a codeword (quantization error 0), so
    // ADC = csim + dot(qn, r̂) = dot(qn, nv) — the clone's approximate
    // score must equal the EXACT cosine at full probe
    val nCells = 2
    val ksub = 16
    val clones = corpus.filter($"vec_id" >= nCells &&
        $"vec_id" < nCells + ksub)
      .select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
    val planted = corpus.unionByName(clones)
    // k beyond the candidate count (500 + 16 clones) so every clone
    // is listed regardless of where it ranks
    val got = Pq.ivfPqTopK(planted, queries, k = 1000, nCells = nCells,
        nProbe = nCells, m = 8, ksub = ksub, residual = true)
      .filter($"neighbor_id" >= 1000L)
      .select($"query_id", ($"neighbor_id" - 1000L).as("vec_id"), $"adc")
    val exact = queries.crossJoin(
        corpus.select($"vec_id", Similarity.asDouble($"embedding").as("v")))
      .select($"query_id", $"vec_id",
        round(Similarity.cosine(Similarity.asDouble($"query_vec"), $"v"), 6)
          .as("cos"))
    val joined = got.join(exact, Seq("query_id", "vec_id")).collect()
    assert(joined.length == 3 * ksub, s"expected all clones listed")
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("adc") - r.getAs[Double]("cos")) < 2e-6,
        s"clone adc ${r.getAs[Double]("adc")} != cos ${r.getAs[Double]("cos")}")
    }
  }

  test("trainResidualCodebooks: monotone objective, improves on seed") {
    val (cb, hist) = Pq.trainResidualCodebooks(corpus, m = 8, ksub = 16,
      nCells = 16, maxIter = 3)
    assert(cb.count() == 8 * 16)
    hist.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"objective rose: $a -> $b")
      case _         =>
    }
    val seedErr = Pq.encodeResidual(corpus,
        Pq.seedResidualCodebooks(corpus, m = 8, ksub = 16, nCells = 16),
        m = 8, nCells = 16)
      .agg(sum($"qerr")).head().getDouble(0)
    val trainedErr = Pq.encodeResidual(corpus, cb, m = 8, nCells = 16)
      .agg(sum($"qerr")).head().getDouble(0)
    assert(trainedErr <= seedErr + 1e-9,
      s"residual training worsened quantization: $seedErr -> $trainedErr")
  }

  test("rerank with full shortlist == exact cosine over probed cells") {
    // a shortlist admitting every probed candidate reduces rerank to
    // exact cosine over the probed cells — which is ivfTopK verbatim
    // (same probe-selection and rank tie conventions)
    val exactProbed = Similarity.ivfTopK(corpus, queries, k = 3,
        nCells = 8, nProbe = 4)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val rer = Pq.ivfPqRerank(corpus, queries, k = 3, shortlist = 10000,
        nCells = 8, nProbe = 4, m = 8, ksub = 16)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(rer == exactProbed,
      "full-shortlist rerank must equal ivfTopK at the same geometry")
  }

  test("rerank recall@5 >= plain ADC recall@5 at the trained point") {
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val adc = recallOf(Pq.ivfPqTopK(corpus, queries, k = 5, nCells = 8,
      nProbe = 4, m = 16, ksub = 16, trainIters = 3))
    val rer = recallOf(Pq.ivfPqRerank(corpus, queries, k = 5,
      shortlist = 20, nCells = 8, nProbe = 4, m = 16, ksub = 16,
      trainIters = 3))
    assert(rer >= adc,
      s"rerank recall $rer fell below plain ADC recall $adc")
  }

  test("clustered fixture (Tables-level): residual recall beats raw; rerank ~exact") {
    // The corpus-scale promotion of the clustered micro-fixture
    // (VERDICT r12 #2): on Tables.clusteredEmbeddings the recall
    // operating points sit in the PUBLISHED regime instead of the
    // isotropic floor — measured at this scale: residual 0.415 vs raw
    // 0.169 (m=16/ksub=16/iters=3), rerank 1.0; floors conservative.
    val c = graft.Tables.clusteredEmbeddings(spark, sf)
      .localCheckpoint(true)
    val qs = c.filter($"vec_id" % 40 === 17)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
      .localCheckpoint(true)
    val exact = Similarity.bruteForceTopK(c, qs, k = 10)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val res = recallOf(Pq.ivfPqTopK(c, qs, k = 10, nCells = 16, nProbe = 4,
      m = 16, ksub = 16, trainIters = 3, residual = true))
    assert(res >= 0.25,
      s"clustered residual recall $res below the trained-regime floor")
    val rer = recallOf(Pq.ivfPqRerank(c, qs, k = 10, shortlist = 50,
      nCells = 16, nProbe = 4, m = 16, ksub = 16, trainIters = 3,
      residual = true))
    assert(rer >= 0.8, s"clustered rerank recall $rer (measured 1.0)")
    assert(rer >= res - 1e-9,
      s"rerank ($rer) must not fall below plain residual ADC ($res)")
  }

  test("encode output is m one-byte-range codes (the 64x memory point)") {
    val enc = Pq.encode(corpus, Pq.seedCodebooks(corpus, m = 8, ksub = 16),
      m = 8)
    val bad = enc.filter(exists($"codes", c => c < 0 || c > 255)).count()
    assert(bad == 0)
    assert(enc.select(max(size($"codes"))).head().getInt(0) == 8)
  }
}
