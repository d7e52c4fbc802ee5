package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_fingerprint(text)` — polynomial (Rabin-Karp) rolling hash
  * over UTF-8 byte k-grams, returning the MINIMUM window hash: a
  * winnowing-style document fingerprint. Two documents sharing any
  * k-byte run are likely to share the minimum — the classic cheap
  * near-dup/containment signal that md5-of-content cannot give.
  *
  * Second custom codegen'd Catalyst expression (after [[WktPoint]]):
  * here the payoff is a tight imperative loop per row — one pass over
  * the bytes with O(1) window updates — which no composition of
  * built-in expressions can match (a higher-order-function rendition
  * would be interpreted AND quadratic without the rolling update).
  *
  * Deterministic: fixed base/window; documents shorter than the window
  * hash their whole byte sequence.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RollingFingerprint.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarder on the companion class, not `.MODULE$` (which is
    // only a member of the object class and fails Janino compilation)
    val helper = RollingFingerprint.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$helper.fingerprint($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)

  override def prettyName: String = "rolling_fingerprint"
}

object RollingFingerprint {

  /** Window length in bytes (k-gram size). */
  val K = 16
  /** Polynomial base (odd, > 256) and implicit mod 2^64 arithmetic. */
  private val B = 1000003L
  /** B^(K-1) for the O(1) outgoing-byte removal. */
  private val BK1: Long = {
    var p = 1L
    var i = 0
    while (i < K - 1) { p *= B; i += 1 }
    p
  }

  /** Minimum k-gram polynomial hash over the UTF-8 bytes; whole-string
    * hash when shorter than K. Finalized through a xorshift mix so
    * near-identical windows spread across the long range.
    */
  def fingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    var h = 0L
    var i = 0
    val limit = math.min(n, K)
    while (i < limit) { h = h * B + (bytes(i) & 0xff); i += 1 }
    if (n <= K) return mix(h)
    var minH = mix(h)
    while (i < n) {
      h = (h - (bytes(i - K) & 0xff) * BK1) * B + (bytes(i) & 0xff)
      val m = mix(h)
      if (m < minH) minH = m
      i += 1
    }
    minH
  }

  private def mix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x
  }

  def rolling_fingerprint(c: Column): Column =
    org.apache.spark.sql.functions.call_function("rolling_fingerprint", c)

  def registration: (String, ExpressionInfo, Seq[Expression] => Expression) = (
    "rolling_fingerprint",
    new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
    (exprs: Seq[Expression]) => RollingFingerprint(exprs.head))
}
