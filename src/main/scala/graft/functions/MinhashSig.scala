package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.operators.Dedup

/** `minhash_sig(token_hashes[, shingle_k, num_hashes])` — the whole
  * per-document MinHash signature (hash-space k-shingling + the per-seed
  * affine-xorshift permutation family) as ONE compiled pass over a bound
  * `array<bigint>` token-hash column.
  *
  * Why this exists: the batch signature path
  * ([[graft.operators.Dedup.signatures]]) explodes shingles and takes 64
  * codegen min-aggregates — the right shape when an aggregation is
  * allowed. A STREAMING near-dup pipeline cannot put an aggregation
  * before its stateful operator (multiple stateful operators are
  * unsupported in append mode), so it needs the signature per-row — and
  * the per-row HOF form ([[graft.operators.Dedup.minhashSignature]])
  * interprets its lambdas, re-walking the shingle array once per seed:
  * measured minutes at sf0.1 where this expression takes seconds. One
  * `while` loop over shingles updating all 64 mins keeps the work
  * O(tokens · numHashes) in compiled code, zero allocations beyond the
  * output array, and inside whole-stage codegen.
  *
  * Parity contract (spec-pinned against BOTH existing forms): shingle i
  * is Spark `xxhash64` (seed 42, element-fold) over token hashes
  * [i, i+k); documents shorter than k hash the whole array as one
  * shingle (empty docs hash zero elements — the bare seed); signature
  * element s = min over shingles of `mix(A_s·h + B_s)` with the
  * [[graft.operators.Dedup.seedPerms]] family-v2 constants. Null
  * elements are skipped exactly as Spark's hash expression skips them.
  */
case class MinhashSig(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression {

  require(shingleK >= 1, "minhash_sig shingle_k must be >= 1")
  require(numHashes >= 1 && numHashes <= Dedup.seedPerms.length,
    s"minhash_sig num_hashes must be in [1, ${Dedup.seedPerms.length}]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires an array<bigint> argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(th: Any): Any =
    MinhashSig.compute(th.asInstanceOf[ArrayData], shingleK, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = MinhashSig.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, th =>
      s"${ev.value} = $mod.compute($th, $shingleK, $numHashes);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinhashSig {

  private val XXHASH64_DEFAULT_SEED = 42L

  /** One pass: for each shingle hash, update every seed's running min.
    * Shingle hashes replicate Spark's `xxhash64` fold (null elements
    * leave the running hash unchanged, matching HashExpression).
    */
  def compute(th: ArrayData, k: Int, numHashes: Int): ArrayData = {
    val n = th.numElements()
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var s = 0
    while (s < numHashes) {
      val p = Dedup.seedPerms(s)
      as(s) = p._1
      bs(s) = p._2
      s += 1
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    @inline def absorb(sh: Long): Unit = {
      var i = 0
      while (i < numHashes) {
        val v = sh * as(i) + bs(i)
        val m = v ^ (v >>> 32)
        if (m < sig(i)) sig(i) = m
        i += 1
      }
    }
    if (n < k) {
      var h = XXHASH64_DEFAULT_SEED
      var i = 0
      while (i < n) {
        if (!th.isNullAt(i)) h = XXH64.hashLong(th.getLong(i), h)
        i += 1
      }
      absorb(h)
    } else {
      var i = 0
      while (i <= n - k) {
        var h = XXHASH64_DEFAULT_SEED
        var j = 0
        while (j < k) {
          if (!th.isNullAt(i + j)) h = XXH64.hashLong(th.getLong(i + j), h)
          j += 1
        }
        absorb(h)
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  def minhash_sig(tokenHashes: Column,
                  shingleK: Int = Dedup.DefaultShingleK,
                  numHashes: Int = 64): Column =
    GraftColumnBridge.column(
      MinhashSig(GraftColumnBridge.expression(tokenHashes), shingleK, numHashes))

  def registration: (String, ExpressionInfo, Seq[Expression] => Expression) = (
    "minhash_sig",
    new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
    (exprs: Seq[Expression]) => {
      require(exprs.nonEmpty && exprs.length <= 3,
        "minhash_sig(token_hashes[, shingle_k, num_hashes])")
      def intLit(e: Expression, what: String): Int = {
        require(e.foldable, s"minhash_sig $what must be a literal")
        e.eval() match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"minhash_sig $what must be an integer literal, got $other")
        }
      }
      // defaults shared with the batch family (Dedup.DefaultShingleK) so
      // the SQL surface and every Scala entry point agree on one
      // signature space — the ADVICE r11 default-divergence lesson
      val k = if (exprs.length > 1) intLit(exprs(1), "shingle_k")
              else Dedup.DefaultShingleK
      val nh = if (exprs.length > 2) intLit(exprs(2), "num_hashes") else 64
      MinhashSig(exprs.head, k, nh)
    })
}
