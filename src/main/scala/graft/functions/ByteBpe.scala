package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE pretokenization (the GPT-2 lineage, Radford et al.
  * 2019): a word's UTF-8 BYTES — not its characters — are the BPE base
  * alphabet, each byte rendered as one printable unicode character by a
  * fixed 256-entry bijection. Consequences:
  *
  *  - NO token is ever out-of-vocabulary: any string, any script, any
  *    emoji, even invalid UTF-16 surrogate halves, decomposes to bytes,
  *    and all 256 byte symbols are in the alphabet by construction;
  *  - the mapping is a bijection, so `decode ∘ encode` is the identity
  *    on every word (round-trip pinned in ByteBpeSpec);
  *  - trained merges are ordinary [[BpeEncode]] merges over the mapped
  *    alphabet — the codegen encode expression is REUSED unchanged,
  *    byte-level BPE is pretokenize-compose, not a new tokenizer core.
  *
  * The bijection is the public GPT-2 `bytes_to_unicode` construction:
  * printable bytes (`!`..`~`, `¡`..`¬`, `®`..`ÿ`) map to themselves;
  * the remaining 68 bytes map to U+0100, U+0101, … in byte order — so
  * every symbol is one visible BMP character and merge tables stay
  * printable/debuggable.
  */
object ByteMap {

  /** byte value (0–255) → mapped character. */
  val byteToChar: IndexedSeq[Char] = {
    val printable = (('!'.toInt to '~'.toInt) ++
      ('¡'.toInt to '¬'.toInt) ++
      ('®'.toInt to 'ÿ'.toInt)).toSet
    var next = 256
    (0 until 256).map { b =>
      if (printable(b)) b.toChar
      else { val c = next.toChar; next += 1; c }
    }
  }

  /** mapped character → byte value — the exact inverse. */
  val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Driver-side word → byte-symbol string (the [[ByteSyms]] eval). */
  def toByteSymbols(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(byteToChar(bytes(i) & 0xff))
      i += 1
    }
    sb.toString
  }

  /** Driver-side piece array → original string (symbol chars → bytes →
    * UTF-8). Throws on a character outside the 256-symbol alphabet —
    * a piece that came from anything but [[toByteSymbols]] output.
    */
  def decodePieces(pieces: Seq[String]): String = {
    val joined = pieces.mkString
    val bytes = new Array[Byte](joined.length)
    var i = 0
    while (i < joined.length) {
      val c = joined.charAt(i)
      bytes(i) = charToByte.getOrElse(c, throw new IllegalArgumentException(
        s"byte_bpe_decode: character U+${c.toInt.toHexString} is not a " +
        "byte symbol — pieces must come from byte_syms/byte-level encode"
      )).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** `byte_syms(word)` — render a word as its byte-symbol string (one
  * mapped character per UTF-8 byte). Compose with [[BpeEncode]] (empty
  * endMark) for the full GPT-2-shape encode; [[ByteBpeDecode]] is the
  * inverse of the composition.
  */
case class ByteSyms(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_syms requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  def run(w: UTF8String): UTF8String = {
    // UTF8String exposes the UTF-8 bytes directly — no re-encode
    val bytes = w.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(ByteMap.byteToChar(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteSyms", this, classOf[ByteSyms].getName)
    defineCodeGen(ctx, ev, c => s"$ref.run($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ByteSyms =
    copy(child = newChild)

  override def prettyName: String = "byte_syms"
}

/** `byte_bpe_decode(pieces)` — invert the byte-level encode: concat the
  * piece symbols, map each character back to its byte, UTF-8-decode.
  * Null on null input; a non-symbol character is a hard error (the
  * caller fed pieces from a different alphabet), not silent corruption.
  */
case class ByteBpeDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_bpe_decode requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  def run(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < n) {
      val piece = arr.getUTF8String(i).toString
      var j = 0
      while (j < piece.length) {
        val c = piece.charAt(j)
        out.write(ByteMap.charToByte.getOrElse(c,
          throw new IllegalArgumentException(
            s"byte_bpe_decode: character U+${c.toInt.toHexString} is not " +
            "a byte symbol")))
        j += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  override def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeDecode", this,
      classOf[ByteBpeDecode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.run($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ByteBpeDecode = copy(child = newChild)

  override def prettyName: String = "byte_bpe_decode"
}

object ByteBpe {
  import org.apache.spark.sql.GraftColumnBridge
  import org.apache.spark.sql.{functions => F}

  /** Column API: word → byte-symbol string (bridged directly — no
    * session registration required; the SQL names below are the
    * opt-in surface).
    */
  def byte_syms(word: Column): Column =
    GraftColumnBridge.column(ByteSyms(GraftColumnBridge.expression(word)))

  /** Column API: byte-level BPE encode — [[ByteSyms]] composed with the
    * reused [[BpeEncode]] loop over the byte alphabet (empty endMark:
    * GPT-2 has no word-terminal symbol; the pretokenizer owns word
    * boundaries).
    */
  def byte_bpe_encode(word: Column,
                      merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(BpeEncode(
      GraftColumnBridge.expression(byte_syms(word)), merges, endMark = ""))

  /** Column API: pieces → original word. */
  def byte_bpe_decode(pieces: Column): Column =
    GraftColumnBridge.column(
      ByteBpeDecode(GraftColumnBridge.expression(pieces)))

  /** Byte-level BPE training: map every token to its byte-symbol string
    * (stateless, in the one corpus pass), then the ordinary
    * [[graft.operators.Bpe.trainFast]] driver loop over the mapped
    * alphabet with no endMark. The merge list feeds [[byte_bpe_encode]]
    * directly.
    */
  def trainFast(docs: org.apache.spark.sql.DataFrame, toksCol: String,
                numMerges: Int, minFreq: Long = 1L,
                maxVocab: Int = 1 << 24): Seq[(String, String)] =
    graft.operators.Bpe.trainFast(
      docs.select(F.transform(F.col(toksCol), t => byte_syms(t))
        .as(toksCol)),
      toksCol, numMerges, endMark = "", minFreq = minFreq,
      maxVocab = maxVocab)

  def registrations: Seq[(String, ExpressionInfo,
                          Seq[Expression] => Expression)] = Seq(
    ("byte_syms",
      new ExpressionInfo(classOf[ByteSyms].getName, "byte_syms"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "byte_syms(word)")
        ByteSyms(exprs.head)
      }),
    ("byte_bpe_decode",
      new ExpressionInfo(classOf[ByteBpeDecode].getName, "byte_bpe_decode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "byte_bpe_decode(pieces)")
        ByteBpeDecode(exprs.head)
      }))
}
