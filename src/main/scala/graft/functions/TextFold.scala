package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `fold_text(s)` — Unicode case/diacritic folding in one pass: ROOT
  * lowercase → NFD decompose → drop combining marks (Mn/Mc/Me). The
  * normalization step a multilingual corpus gets BEFORE line/minhash
  * dedup, so "Café", "CAFÉ" and "café" all land on the same
  * dedup key.
  *
  * Genuinely codegen'd `UnaryExpression` (no `CodegenFallback`) like
  * [[WktPoint]], so it fuses into whole-stage codegen; the DuckDB
  * contract `strip_accents(nfc_normalize(lower(x)))` is pinned by the
  * `q_text_fold` gate on planted accented strings.
  */
case class FoldText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fold_text requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    FoldText.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarder on the companion class (same Janino constraint
    // as WktPoint: MODULE$ is not addressable from generated code)
    val helper = FoldText.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$helper.fold($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): FoldText =
    copy(child = newChild)

  override def prettyName: String = "fold_text"
}

object FoldText {

  /** Lowercase (ROOT locale), NFD, strip combining marks. ASCII input —
    * the 100 TB common case — short-circuits: already-lower pure-ASCII
    * strings return the input UTF8String unchanged (no allocation).
    */
  def fold(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    var asciiLower = true
    var i = 0
    while (asciiLower && i < str.length) {
      val c = str.charAt(i)
      if (c >= 0x80 || (c >= 'A' && c <= 'Z')) asciiLower = false
      i += 1
    }
    if (asciiLower) return s
    val lowered = str.toLowerCase(java.util.Locale.ROOT)
    val nfd = java.text.Normalizer.normalize(lowered, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var cp = 0
    i = 0
    while (i < nfd.length) {
      cp = nfd.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column-API entry point (requires [[graft.plans.GraftExtensions]] or
    * [[graft.plans.GraftFunctions.register]] on the session).
    */
  def fold_text(c: Column): Column =
    org.apache.spark.sql.functions.call_function("fold_text", c)

  def registration: (String, ExpressionInfo, Seq[Expression] => Expression) = (
    "fold_text",
    new ExpressionInfo(classOf[FoldText].getName, "fold_text"),
    (exprs: Seq[Expression]) => FoldText(exprs.head))
}
