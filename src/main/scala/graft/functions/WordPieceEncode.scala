package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `wordpiece_encode(word)` — greedy longest-match-first segmentation of
  * one word against a TRAINED WordPiece vocabulary (the BERT tokenizer
  * apply step), as a custom codegen'd Catalyst expression — the
  * [[BpeEncode]] / [[UnigramEncode]] pattern for the third tokenizer
  * family.
  *
  * The vocabulary is a foldable literal extracted ONCE at plan time;
  * the expression instance carries the piece set (per-instance state
  * referenced from generated code via addReferenceObj), so per-word
  * cost is the longest-match scan — O(len²) worst-case hash probes on
  * short words, independent of vocabulary size, in one tight JVM loop.
  *
  * Segmentation semantics are EXACTLY
  * [[graft.operators.WordPiece.encodeLocal]] (this forwards to it):
  * longest vocab prefix first, `##` continuation probes, all-or-nothing
  * `[UNK]` collapse — parity is by construction and additionally
  * spec-pinned interpreted-vs-codegen.
  */
case class WordPieceEncode(child: Expression, vocab: Seq[String],
                           maxInputChars: Int = 200,
                           contPrefix: String = "##",
                           unk: String = "[UNK]") extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  @transient private lazy val pieceSet: Set[String] = vocab.toSet

  def encode(w: UTF8String): ArrayData =
    ArrayData.toArrayData(
      graft.operators.WordPiece
        .encodeLocal(w.toString, pieceSet, contPrefix, unk, maxInputChars)
        .map(UTF8String.fromString).toArray)

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceEncode", this,
      classOf[WordPieceEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_encode"
}

object WordPieceEncode {
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import org.apache.spark.sql.{functions => F}

  /** Column-API entry: vocabulary as a foldable literal string array,
    * extracted once at plan time.
    */
  def wordpiece_encode(word: Column, vocab: Seq[String],
                       maxInputChars: Int = 200): Column =
    F.call_function("wordpiece_encode", word,
      F.array(vocab.map(F.lit): _*), F.lit(maxInputChars))

  /** Flat per-doc piece stream (the chunking/packing input shape). */
  def wordpiece_encode_tokens(toks: Column, vocab: Seq[String],
                              maxInputChars: Int = 200): Column =
    F.flatten(F.transform(toks, t => wordpiece_encode(t, vocab, maxInputChars)))

  private def extractVocab(e: Expression): Seq[String] = {
    require(e.foldable, "wordpiece_encode vocab must be a literal array")
    val arr = e.eval().asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  // the UnigramEncode literal-coercion convention: SQL bigint/int
  // literals both work; non-numeric literals get a descriptive error
  private def litNumber(e: Expression, what: String): Number = {
    require(e.foldable, s"wordpiece_encode $what must be a literal")
    e.eval() match {
      case n: Number => n
      case other => throw new IllegalArgumentException(
        s"wordpiece_encode $what must be a numeric literal, got " +
          s"${if (other == null) "NULL" else other.getClass.getSimpleName}")
    }
  }

  def registration: (String, ExpressionInfo, Seq[Expression] => Expression) = (
    "wordpiece_encode",
    new ExpressionInfo(classOf[WordPieceEncode].getName, "wordpiece_encode"),
    (exprs: Seq[Expression]) => {
      require(exprs.length >= 2 && exprs.length <= 3,
        "wordpiece_encode(word, vocab[, maxInputChars])")
      val maxChars =
        if (exprs.length > 2) litNumber(exprs(2), "maxInputChars").intValue()
        else 200
      WordPieceEncode(exprs.head, extractVocab(exprs(1)), maxChars)
    })
}
