package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.Dedup

/** The compiled [[MinhashSig]] expression must be bit-identical to BOTH
  * existing signature forms — the explode+agg [[Dedup.signatures]] (the
  * batch shape) and the interpreted HOF [[Dedup.minhashSignature]] —
  * because streaming and batch near-dup share one signature space: a
  * drifting constant here silently loses recall against stored
  * signatures (the sig-family lesson).
  */
class MinhashSigSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  private def exprSigs(k: Int, nh: Int) =
    docs.select(col("doc_id").as("id"),
      MinhashSig.minhash_sig(Dedup.tokenHashes(col("text")), k, nh).as("sig"))

  test("bit-identical to the explode+agg batch form on real documents") {
    for ((k, nh) <- Seq((3, 64), (5, 64), (3, 16))) {
      val mismatches = exprSigs(k, nh)
        .join(Dedup.signaturesAgg(docs, "doc_id", "text", k, nh)
          .select(col("id"), col("sig").as("agg_sig")), "id")
        .filter(col("sig") =!= col("agg_sig"))
        .count()
      assert(mismatches == 0L, s"k=$k nh=$nh: $mismatches signature mismatches")
    }
  }

  test("bit-identical to the interpreted HOF form (small subset — the " +
       "HOF form is the slow one this expression replaces)") {
    val sub = docs.limit(25)
    val mism = sub.select(col("doc_id"),
        MinhashSig.minhash_sig(Dedup.tokenHashes(col("text")), 3, 64).as("e"),
        Dedup.minhashSignature(
          Dedup.shingleHashesFromTokenHashes(
            Dedup.tokenHashes(col("text")), 3), 64).as("h"))
      .filter(col("e") =!= col("h")).count()
    assert(mism == 0L)
  }

  test("short and empty docs: whole-array fallback shingle matches the " +
       "column form, and empty text still yields a full signature") {
    val edge = Seq(1L -> "one two", 2L -> "single", 3L -> "")
      .toDF("doc_id", "text")
    val got = edge.select(col("doc_id"),
        MinhashSig.minhash_sig(Dedup.tokenHashes(col("text")), 3, 64).as("e"),
        Dedup.minhashSignature(
          Dedup.shingleHashesFromTokenHashes(
            Dedup.tokenHashes(col("text")), 3), 64).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1).length == 64)
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("null input yields null, not a crash") {
    val r = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(MinhashSig.minhash_sig(
        Dedup.tokenHashes(col("text")), 3, 64).as("s"))
      .collect()
    assert(r.head.isNullAt(0))
  }

  test("SQL registration: literal params through any numeric literal " +
       "type; non-numeric params fail descriptively") {
    graft.plans.GraftFunctions.register(spark)
    Seq(7L -> "spark streams state").toDF("doc_id", "text")
      .createOrReplaceTempView("mh_sig_reg_spec")
    val viaSql = spark.sql(
      """SELECT minhash_sig(transform(split(text, ' '), t -> xxhash64(t)),
        |                   3L, 64) AS s FROM mh_sig_reg_spec""".stripMargin)
      .collect().head.getSeq[Long](0)
    assert(viaSql.length == 64)
    val err = intercept[Exception] {
      spark.sql(
        """SELECT minhash_sig(transform(split(text, ' '), t -> xxhash64(t)),
          |                   'three') FROM mh_sig_reg_spec""".stripMargin)
        .collect()
    }
    assert(err.getMessage.contains("shingle_k"), err.getMessage)
  }
}
