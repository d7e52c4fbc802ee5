package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** S-curve calibration of the minhash family against closed-form theory.
  *
  * MinHash with a min-wise-independent family satisfies
  * P(sig position agrees) = jaccard, so 8x8 banded LSH detects a pair
  * with p(s) = 1 - (1 - s^8)^8. This spec PLANTS pairs at exactly-known
  * shingle jaccard (shared token prefix + fresh suffix: with k-shingles,
  * j = (m-k+1) / (2(n-k+1) - (m-k+1)) for docs of n tokens sharing a
  * prefix of m) and asserts three statistical properties of the shipped
  * affine-xorshift family (Dedup.seedPerm):
  *
  *  1. BIAS — mean signature agreement over 400 pairs/level tracks s;
  *  2. INDEPENDENCE — variance of the per-pair agreement COUNT tracks
  *     the Binomial(64, s) variance. This is the direct detector for
  *     the round-8 double-hashing pathology: correlated min-capture
  *     across seeds inflates this variance far above binomial even when
  *     the marginal bias looks fine;
  *  3. DETECTION — empirical banded-LSH recall per level sits inside a
  *     4-sigma band of p(s), both tails: high-s levels must be found,
  *     low-s levels must NOT flood through (the precision side that
  *     keeps candidate generation sub-quadratic on real corpora).
  *
  * The fixture is deterministic (no RNG), so the bounds are re-runnable
  * facts about the shipped family, not flaky statistics. Measured values
  * are recorded in BASELINE.md round 9.
  */
class MinhashSCurveSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (target jaccard, tokens per doc n, shared prefix m) with shingleK=5:
  // j = (m-4) / (2(n-4) - (m-4)) — each triple solves exactly.
  private val levels = Seq(
    (0.30, 17, 10),
    (0.50, 19, 14),
    (0.70, 21, 18),
    (0.80, 22, 20),
    (0.90, 42, 40),
    (0.95, 82, 80))
  private val pairsPerLevel = 400
  private val numHashes = 64
  private val bandsB = 8
  private val rowsR = 8

  private def theory(s: Double): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsR), bandsB)

  // Token universes are disjoint across pairs and levels, so the only
  // shingles two docs can share are within their own planted pair.
  private lazy val docs = {
    val rows = for {
      ((_, n, m), li) <- levels.zipWithIndex
      p <- 0 until pairsPerLevel
    } yield {
      val base = li * 1000000L + p * 2L
      val shared = (0 until m).map(i => s"L${li}p${p}t$i")
      val tailA = (m until n).map(i => s"L${li}p${p}t$i")
      val tailB = (m until n).map(i => s"L${li}p${p}u$i")
      Seq((base, (shared ++ tailA).mkString(" ")),
          (base + 1L, (shared ++ tailB).mkString(" ")))
    }
    rows.flatten.toDF("doc_id", "text")
  }

  private lazy val sigs =
    Dedup.signatures(docs, "doc_id", "text", shingleK = 5,
      numHashes = numHashes).cache()

  test("planted shingle jaccard is exactly the designed level") {
    // Sanity-check the construction itself with an independent count:
    // distinct shingle STRINGS, not the hash-space pipeline under test.
    val k = 5
    for (((s, n, m), li) <- levels.zipWithIndex) {
      val sa = n - k + 1
      val shared = m - k + 1
      val j = shared.toDouble / (2 * sa - shared)
      assert(math.abs(j - s) < 1e-12, s"level $li design broken: $j != $s")
    }
  }

  test("bias: mean signature agreement tracks jaccard per level") {
    val a = sigs.filter(col("id") % 2 === 0)
      .select((col("id") / 2).cast("long").as("pk"),
              (col("id") / 1000000).cast("int").as("lvl"),
              col("sig").as("sa"))
    val b = sigs.filter(col("id") % 2 === 1)
      .select(floor(col("id") / 2).cast("long").as("pk"),
              col("sig").as("sb"))
    val agree = a.join(b, "pk")
      .select(col("lvl"),
              (Dedup.signatureSimilarity(col("sa"), col("sb"))
                * numHashes).as("k"))
      .cache()
    val stats = agree.groupBy("lvl")
      .agg(avg(col("k") / numHashes).as("meanAgree"),
           var_samp(col("k")).as("varK"),
           count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    for (((s, _, _), li) <- levels.zipWithIndex) {
      val (mean, varK, n) = stats(li)
      assert(n == pairsPerLevel)
      val binomVar = numHashes * s * (1 - s)
      info(f"s=$s%.2f meanAgree=$mean%.4f (target $s%.2f)  " +
           f"varK=$varK%.2f (binomial $binomVar%.2f, ratio ${varK / binomVar}%.2f)")
      // 4-sigma on the mean of 400 Binomial(64,s)/64 draws is ~0.01;
      // 0.02 leaves room for the family's (deterministic) non-ideality
      // while still failing on any real bias.
      assert(math.abs(mean - s) <= 0.02,
        f"family BIASED at s=$s%.2f: mean agreement $mean%.4f")
      // Correlated seeds (the round-8 double-hashing bug) inflate the
      // agreement-count variance above binomial; perfectly anti-correlated
      // families deflate it. Either direction breaks the detection curve.
      assert(varK / binomVar >= 0.4 && varK / binomVar <= 2.5,
        f"family CORRELATED at s=$s%.2f: var ratio ${varK / binomVar}%.2f")
    }
    agree.unpersist()
  }

  test("detection: banded LSH recall sits on the 1-(1-s^8)^8 curve") {
    val cand = Dedup.lshCandidatePairsFromSigs(sigs, numHashes = numHashes,
      numBands = bandsB, maxBucket = 200).cache()
    // Disjoint token universes: every emitted candidate must be planted.
    val cross = cand.filter(floor(col("a") / 2) =!= floor(col("b") / 2)).count()
    assert(cross == 0, s"$cross cross-pair candidates from disjoint universes")
    val byLevel = cand
      .select((col("a") / 1000000).cast("int").as("lvl"))
      .groupBy("lvl").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (((s, _, _), li) <- levels.zipWithIndex) {
      val p = theory(s)
      val emp = byLevel.getOrElse(li, 0L).toDouble / pairsPerLevel
      val sigma = math.sqrt(p * (1 - p) / pairsPerLevel)
      info(f"s=$s%.2f theory=$p%.4f empirical=$emp%.4f (4-sigma ${4 * sigma}%.4f)")
      // Both tails: low-s levels must not flood through (precision),
      // high-s levels must be recovered (recall). The +2/N slack keeps
      // the tiny-p levels from failing on a single extra hash collision.
      assert(math.abs(emp - p) <= 4 * sigma + 2.0 / pairsPerLevel,
        f"recall off-curve at s=$s%.2f: empirical $emp%.4f vs theory $p%.4f")
    }
    cand.unpersist()
    sigs.unpersist()
  }
}
