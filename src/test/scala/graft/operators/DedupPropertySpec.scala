package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property-style invariants for the dedup text machinery, evaluated in
  * BATCH (one generated frame, one Spark job per property — per-case
  * Spark roundtrips would make 200 cases take minutes). Generators are
  * fixed-seed (`Seed(42)`): the cases are deterministic, so a failure
  * reproduces.
  */
class DedupPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val words =
    Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "muon", "nu", "xi", "omicron", "pion",
      "rho", "sigma", "tau")

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    LazyList.iterate(Seed(42L))(_.next).take(n)
      .map(s => g.pureApply(Gen.Parameters.default, s)).toList

  private val tokenList: Gen[List[String]] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, Gen.oneOf(words)))

  test("jaccardTokens equals the set-math reference on random pairs") {
    val cases = sample(Gen.zip(tokenList, tokenList), 200)
    val expected = cases.map { case (a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val u = (sa ++ sb).size
      if (u == 0) 0.0 else (sa & sb).size.toDouble / u
    }
    val got = cases.toDF("ta", "tb")
      .select(Dedup.jaccardTokens(array_distinct(col("ta")),
                                  array_distinct(col("tb"))))
      .as[Double].collect()
    expected.zip(got).zipWithIndex.foreach { case ((e, g), i) =>
      assert(math.abs(e - g) < 1e-12, s"case $i: expected $e got $g")
    }
  }

  test("exactFingerprint is whitespace-invariant and token-sensitive") {
    val cases = sample(tokenList.filter(_.nonEmpty), 100)
    val df = cases.zipWithIndex.map { case (toks, i) =>
      (i.toLong, toks.mkString(" "),
       "  " + toks.mkString("   ") + "\t",      // messy-whitespace twin
       (toks :+ "extra").mkString(" "))          // one-token difference
    }.toDF("id", "clean", "messy", "grown")
    val fp = graft.functions.TextFunctions.exactFingerprint _
    val bad = df.select(
      (fp(col("clean")) === fp(col("messy"))).as("ws_ok"),
      (fp(col("clean")) =!= fp(col("grown"))).as("diff_ok"))
      .filter(!col("ws_ok") || !col("diff_ok")).count()
    assert(bad == 0L)
  }

  test("minhash signatures: identical texts agree fully, disjoint near zero") {
    val cases = sample(Gen.chooseNum(6, 20), 50)
    val rows = cases.zipWithIndex.map { case (n, i) =>
      val a = (0 until n).map(j => s"w${i}_$j").mkString(" ")
      val b = (0 until n).map(j => s"v${i}_$j").mkString(" ") // disjoint
      (i.toLong, a, b)
    }
    val docs = rows.flatMap { case (i, a, b) =>
      Seq((i * 10, a), (i * 10 + 1, a), (i * 10 + 2, b)) // clone + disjoint
    }.toDF("doc_id", "text")
    val sigs = Dedup.signatures(docs, "doc_id", "text", 5, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (i, _, _) =>
      val (sa, sa2, sb) = (sigs(i * 10), sigs(i * 10 + 1), sigs(i * 10 + 2))
      assert(sa == sa2, s"case $i: clones disagree")
      val agree = sa.zip(sb).count { case (x, y) => x == y }
      assert(agree <= 64 * 3 / 10, s"case $i: disjoint texts agree $agree/64")
    }
  }
}
