package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.operators.Bpe

/** The min-rank encode loop must equal applyMerges' in-order fold for
  * TRAINED merge lists (the expression's documented equivalence
  * contract) — pinned on the classic corpus, on randomized trained
  * lists, and across the interpreted/codegen boundary.
  */
class BpeEncodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sennrichMerges(n: Int): Seq[(String, String)] = {
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Bpe.trainFast(Seq((1L, words)).toDF("doc_id", "toks"), "toks", n)
  }

  private def viaExpr(words: Seq[String],
                      merges: Seq[(String, String)]): Seq[Seq[String]] = {
    graft.plans.GraftFunctions.register(spark) // call_function needs the registry
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("wid", "word")
    df.select(col("wid"), BpeEncode.bpe_encode(col("word"), merges).as("p"))
      .orderBy("wid").as[(Long, Seq[String])].collect().map(_._2).toSeq
  }

  private def viaFold(words: Seq[String],
                      merges: Seq[(String, String)]): Seq[Seq[String]] = {
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, Seq(w)) }
      .toDF("wid", "toks")
    Bpe.applyMerges(df, "wid", "toks", merges)
      .orderBy("wid").select("pieces")
      .as[Seq[String]].collect().toSeq
  }

  test("parity with applyMerges on the trained Sennrich list") {
    val merges = sennrichMerges(50) // runs to exhaustion
    val words = Seq("newest", "low", "lowest", "wider", "unseen", "n", "")
    assert(viaExpr(words, merges) == viaFold(words, merges))
  }

  test("parity on randomized trained lists (ties, aaa overlaps, unseen chars)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val corpus = Seq.fill(20)(
        (1 to (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString)
      // trained list via the session-free driver loop on a hand table
      val freqs = corpus.groupBy(identity).map { case (w, g) =>
        (g.size.toLong, (w.map(_.toString) :+ "</w>").toIndexedSeq)
      }.toSeq
      val merges = Bpe.trainLocal(freqs, 8)
      val words = Seq.fill(12)(
        (1 to (1 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(4)).toChar)
          .mkString) ++ Seq("aaaa", "dddd")
      assert(viaExpr(words, merges) == viaFold(words, merges),
        s"trial $trial merges=$merges")
    }
  }

  test("interpreted eval equals the codegen path") {
    val merges = sennrichMerges(3)
    val e = BpeEncode(
      org.apache.spark.sql.catalyst.expressions.Literal("newest"), merges)
    val interp = e.encode(
        org.apache.spark.unsafe.types.UTF8String.fromString("newest"))
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(interp == Seq("n", "e", "w", "est</w>"))
    assert(viaExpr(Seq("newest"), merges) == Seq(Seq("n", "e", "w", "est</w>")))
  }

  test("SQL registration: bpe_encode callable from spark.sql") {
    graft.plans.GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT bpe_encode('lot', array(struct('l', 'o')), '</w>') AS p""")
      .as[Seq[String]].head()
    assert(got == Seq("lo", "t", "</w>"))
  }

  test("bpe_encode_tokens: flat per-doc piece stream equals word-wise encode") {
    graft.plans.GraftFunctions.register(spark)
    val merges = sennrichMerges(3)
    val df = Seq((1L, Seq("newest", "low"))).toDF("doc_id", "toks")
    val got = df.select(
        BpeEncode.bpe_encode_tokens(col("toks"), merges).as("p"))
      .as[Seq[String]].head()
    assert(got == Seq("n", "e", "w", "est</w>", "l", "o", "w", "</w>"))
    // parity with applyMerges' pieces, flattened in word order
    val fold = Bpe.applyMerges(df, "doc_id", "toks", merges)
      .orderBy("word_pos").select("pieces")
      .as[Seq[String]].collect().toSeq.flatten
    assert(got == fold)
  }

  test("edge cases: empty merge list, empty word, empty endMark") {
    assert(viaExpr(Seq("ab"), Nil) == Seq(Seq("a", "b", "</w>")))
    assert(viaExpr(Seq(""), Seq(("a", "b"))) == Seq(Seq("</w>")))
    val df = Seq(Tuple1("ab")).toDF("word")
    val got = df.select(
        BpeEncode.bpe_encode(col("word"), Seq(("a", "b")), endMark = "").as("p"))
      .as[Seq[String]].head()
    assert(got == Seq("ab"))
  }
}
