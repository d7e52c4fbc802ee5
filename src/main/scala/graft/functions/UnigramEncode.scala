package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `unigram_encode(word)` — maximum-likelihood segmentation of one word
  * against a TRAINED unigram-LM piece vocabulary (the SentencePiece
  * apply step), as a custom codegen'd Catalyst expression — the
  * [[BpeEncode]] pattern for the other tokenizer family.
  *
  * The vocabulary is a foldable literal extracted ONCE at plan time;
  * the expression instance carries the piece→logp hash map (per-
  * instance state referenced from generated code via addReferenceObj),
  * so per-word cost is the Viterbi DP — O(len × maxPieceLen) hash
  * probes — independent of vocabulary size, in one tight JVM loop.
  *
  * Segmentation semantics are EXACTLY
  * [[graft.operators.Unigram.viterbiLocal]] (this forwards to it):
  * longest-piece tie-break, `unkLogp` single-codepoint fallback —
  * parity is by construction and additionally spec-pinned
  * interpreted-vs-codegen.
  */
case class UnigramEncode(child: Expression, vocab: Seq[(String, Double)],
                         maxPieceLen: Int = 8,
                         unkLogp: Double = -100.0) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_encode requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  @transient private lazy val scores: Map[String, Double] = vocab.toMap

  def encode(w: UTF8String): ArrayData =
    ArrayData.toArrayData(
      graft.operators.Unigram
        .viterbiLocal(w.toString, scores, maxPieceLen, unkLogp)
        .map(UTF8String.fromString).toArray)

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramEncode", this,
      classOf[UnigramEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)

  override def prettyName: String = "unigram_encode"
}

object UnigramEncode {
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import org.apache.spark.sql.{functions => F}

  /** Column-API entry: vocabulary as a foldable literal array of
    * (piece, logp) structs, extracted once at plan time.
    */
  def unigram_encode(word: Column, vocab: Seq[(String, Double)],
                     maxPieceLen: Int = 8,
                     unkLogp: Double = -100.0): Column =
    F.call_function("unigram_encode", word,
      F.array(vocab.map { case (p, lp) =>
        F.struct(F.lit(p), F.lit(lp)) }: _*),
      F.lit(maxPieceLen), F.lit(unkLogp))

  /** Flat per-doc piece stream (the chunking/packing input shape). */
  def unigram_encode_tokens(toks: Column, vocab: Seq[(String, Double)],
                            maxPieceLen: Int = 8,
                            unkLogp: Double = -100.0): Column =
    F.flatten(F.transform(toks,
      t => unigram_encode(t, vocab, maxPieceLen, unkLogp)))

  private def extractVocab(e: Expression): Seq[(String, Double)] = {
    require(e.foldable, "unigram_encode vocab must be a literal array")
    val arr = e.eval().asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 2)
      (row.getUTF8String(0).toString, row.getDouble(1))
    }
  }

  // Coerce through Number so SQL-side bigint/int literals (e.g.
  // `unigram_encode(w, v, 8L, -100)`) get the same descriptive failure
  // text as arity/foldability errors instead of a raw ClassCastException
  private def litNumber(e: Expression, what: String): Number = {
    require(e.foldable, s"unigram_encode $what must be a literal")
    e.eval() match {
      case n: Number => n
      case other => throw new IllegalArgumentException(
        s"unigram_encode $what must be a numeric literal, got " +
          s"${if (other == null) "NULL" else other.getClass.getSimpleName}")
    }
  }

  def registration: (String, ExpressionInfo, Seq[Expression] => Expression) = (
    "unigram_encode",
    new ExpressionInfo(classOf[UnigramEncode].getName, "unigram_encode"),
    (exprs: Seq[Expression]) => {
      require(exprs.length >= 2 && exprs.length <= 4,
        "unigram_encode(word, vocab[, maxPieceLen[, unkLogp]])")
      val maxLen =
        if (exprs.length > 2) litNumber(exprs(2), "maxPieceLen").intValue()
        else 8
      val unk =
        if (exprs.length > 3) litNumber(exprs(3), "unkLogp").doubleValue()
        else -100.0
      UnigramEncode(exprs.head, extractVocab(exprs(1)), maxLen, unk)
    })
}
