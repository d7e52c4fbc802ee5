package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd vector arithmetic over `array<double>` columns —
  * `vec_dot(a, b)` and `vec_cosine(a, b)`.
  *
  * The HOF rendition (`aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`)
  * is evaluated by interpreted lambdas: every pair allocates a zipped
  * array and walks it element-by-element through the interpreter, and a
  * cosine needs three such passes (dot, ‖a‖², ‖b‖²). These expressions
  * replace that with one compiled loop per pair — no allocation, one
  * pass for all three cosine accumulators — so the similarity operators
  * ([[graft.operators.Similarity]]) stop being GC-bound at scale.
  *
  * Numerics are chosen for oracle bit-compatibility: each accumulator
  * is a plain left-to-right double sum, identical to the fold order of
  * the HOF version and of DuckDB's `list_sum(list_transform(...))`, so
  * swapping implementations cannot move a rounded 6-dp result or a
  * rank. Mismatched lengths and null elements yield NULL (the HOF
  * behavior: `zip_with` pads with null, null poisons the sum).
  */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  /** Boxed-result helper shared by interpreted eval and generated code. */
  def helperName: String

  override def nullSafeEval(a: Any, b: Any): Any =
    helper(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected def helper(a: ArrayData, b: ArrayData): java.lang.Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarder on the plain class — `VectorOps.MODULE$` does NOT
    // exist in bytecode and Janino rejects it, which would silently kick
    // the whole stage back to interpreted execution
    val mod = VectorOps.getClass.getName.stripSuffix("$")
    val tmp = ctx.freshName("vecRes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double $tmp = $mod.$helperName($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })
  }
}

/** `vec_dot(a, b)` — left-to-right Σ aᵢ·bᵢ. */
case class VectorDot(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def helperName: String = "dot"
  override protected def helper(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorOps.dot(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** `vec_cosine(a, b)` — Σab / sqrt(Σa²·Σb²), all three sums in one pass. */
case class VectorCosine(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def helperName: String = "cosine"
  override protected def helper(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorOps.cosine(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorCosine =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_cosine"
}

/** `hyperplane_bucket(vec, nPlanes)` — sign-of-dot-product LSH bucket
  * against `nPlanes` deterministic pseudo-random hyperplanes, as one
  * compiled loop. Replaces a per-row interpreted tower of
  * `transform(sequence(...))` + `zip_with` + `aggregate` per plane
  * (8 planes × dims allocations per row) with zero allocation.
  *
  * Plane components replicate the HOF construction bit-for-bit:
  * `h(p,j) = pmod(xxhash64(p, j), 2000)/1000.0 - 1.0` where
  * `xxhash64(p, j) = XXH64.hashInt(j, XXH64.hashInt(p, 42))` (Spark's
  * seed-chaining over two int children, default seed 42), and each
  * plane's dot is its own left-to-right sum — so buckets are identical
  * to [[graft.operators.Similarity.hyperplaneBucket]]'s HOF original
  * and stable across releases.
  *
  * Null handling deviates from the HOF tower on degenerate input only
  * (null array → NULL here vs 0 there; embeddings are non-null).
  */
case class HyperplaneBucket(child: Expression, nPlanes: Int,
                            planeOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _)
          if nPlanes >= 1 && nPlanes <= 30 && planeOffset >= 0 =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket requires array<double> and 1<=nPlanes<=30, got ${t.sql}")
    }

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VectorOps.hyperplaneBucket(input.asInstanceOf[ArrayData], nPlanes, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = VectorOps.getClass.getName.stripSuffix("$")
    val tmp = ctx.freshName("bucketRes")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |java.lang.Integer $tmp = $mod.hyperplaneBucket($a, $nPlanes, $planeOffset);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.intValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_bucket"
}

/** `sig_agree(a, b)` — fraction of positions where two `array<bigint>`
  * minhash signatures agree, as one compiled loop per pair. Replaces the
  * interpreted `aggregate(zip_with(...))` tower in
  * [[graft.operators.Dedup.signatureSimilarity]]: the estimate filter
  * runs once per LSH candidate pair, so at scale the per-pair lambda
  * interpretation and zipped-array allocation were the filter's whole
  * cost.
  *
  * Semantics match the HOF original exactly (parity-tested): positions
  * beyond the shorter array and null elements count as disagreement
  * (`zip_with` pads with null; `when(x === y)` is null-false), and the
  * denominator is `size(a)`.
  */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_agree requires two array<bigint> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = VectorOps.getClass.getName.stripSuffix("$")
    val tmp = ctx.freshName("agreeRes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double $tmp = $mod.sigAgree($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sig_agree"
}

object VectorOps {

  /** Agreeing-position fraction: matches over i < min(|a|,|b|) with both
    * elements non-null, divided by |a|. Empty `a` ⇒ null (0/0 in the HOF
    * is a null division).
    */
  def sigAgree(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0) return null
    val n = math.min(na, nb)
    var agree = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        agree += 1
      i += 1
    }
    java.lang.Double.valueOf(agree.toDouble / na.toDouble)
  }

  /** Null iff lengths differ or an element is null (HOF-sum parity). */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Each accumulator is its own left-to-right sum — bit-identical to
    * `dot(a,b) / sqrt(dot(a,a) * dot(b,b))` computed as three passes.
    */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sxy = 0.0
    var sxx = 0.0
    var syy = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      sxy += x * y
      sxx += x * x
      syy += y * y
      i += 1
    }
    java.lang.Double.valueOf(sxy / math.sqrt(sxx * syy))
  }

  /** Seed-chained xxhash64 over two int children, matching the SQL
    * expression `xxhash64(p, j)` (default seed 42).
    */
  private def planeHash(hash1: Long, j: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(j, hash1)

  /** Sign-bucket over nPlanes hyperplanes; per-plane sums accumulate
    * left-to-right in j (plane-independent accumulators, so j-outer
    * iteration is bit-identical to the HOF's plane-outer passes).
    * Null element ⇒ every plane dot is null ⇒ HOF bits all fall to the
    * `otherwise(0)` branch ⇒ bucket 0.
    *
    * `planeOffset` selects an independent plane family (global plane
    * index = offset + p) — multi-table OR-amplified LSH hashes the same
    * vector against nTables disjoint families.
    */
  def hyperplaneBucket(v: ArrayData, nPlanes: Int,
                       planeOffset: Int = 0): java.lang.Integer = {
    val n = v.numElements()
    val hash1 = Array.tabulate(nPlanes)(p =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(planeOffset + p, 42L))
    val sums = new Array[Double](nPlanes)
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return Integer.valueOf(0)
      val x = v.getDouble(j)
      var p = 0
      while (p < nPlanes) {
        val h = planeHash(hash1(p), j)
        var r = h % 2000L
        if (r < 0) r += 2000L
        sums(p) += x * ((r.toDouble / 1000.0) - 1.0)
        p += 1
      }
      j += 1
    }
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      if (sums(p) >= 0) bucket |= (1 << p)
      p += 1
    }
    Integer.valueOf(bucket)
  }

  /** Column-API entry points — no registry needed. */
  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VectorDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def vec_cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VectorCosine(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def hyperplane_bucket(v: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    GraftColumnBridge.column(
      HyperplaneBucket(GraftColumnBridge.expression(v), nPlanes, planeOffset))

  def sig_agree(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      SigAgreement(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** (name, info, builder) triples for SQL registration. */
  def registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (e: Seq[Expression]) => VectorDot(e(0), e(1))),
    ("vec_cosine",
      new ExpressionInfo(classOf[VectorCosine].getName, "vec_cosine"),
      (e: Seq[Expression]) => VectorCosine(e(0), e(1))),
    ("sig_agree",
      new ExpressionInfo(classOf[SigAgreement].getName, "sig_agree"),
      (e: Seq[Expression]) => SigAgreement(e(0), e(1))))
}
