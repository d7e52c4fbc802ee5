package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.plans.GraftFunctions

/** The codegen'd vector expressions must be BIT-identical to the HOF
  * rendition they replaced (`aggregate(zip_with(...))`) — the DuckDB
  * oracle hashes 6-dp-rounded doubles, so even a last-ulp drift in a
  * near-tie could flip a rank. Parity is asserted with `==` on raw
  * doubles, not a tolerance.
  */
class VectorOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic "random-ish" vectors: values derived from index math
  private def vec(seed: Int, n: Int): Array[Double] =
    Array.tabulate(n)(i => math.sin(seed * 31.7 + i * 0.83) * (1.0 + i % 7))

  private lazy val pairs = (0 until 50).map { i =>
    (vec(i, 64), vec(i + 1000, 64))
  }.toDF("a", "b")

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("vec_dot bit-identical to interpreted aggregate(zip_with)") {
    val rows = pairs.select(
      VectorOps.vec_dot($"a", $"b").as("fast"),
      hofDot($"a", $"b").as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vec_cosine bit-identical to three-pass dot/sqrt(norm*norm)") {
    val rows = pairs.select(
      VectorOps.vec_cosine($"a", $"b").as("fast"),
      (hofDot($"a", $"b") /
        sqrt(hofDot($"a", $"a") * hofDot($"b", $"b"))).as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null array, null element, and length mismatch all yield NULL") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),       // ok
      (None, Some(Array(1.0, 2.0)))                          // null array
    ).toDF("a", "b")
    val ok = df.select(VectorOps.vec_dot($"a", $"b")).collect()
    assert(ok(0).getDouble(0) == 11.0)
    assert(ok(1).isNullAt(0))

    val mismatch = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .select(VectorOps.vec_dot($"a", $"b"), VectorOps.vec_cosine($"a", $"b"))
      .collect()
    assert(mismatch(0).isNullAt(0) && mismatch(0).isNullAt(1))

    GraftFunctions.register(spark)
    val nullElem = spark.sql(
      "SELECT vec_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) v")
    assert(nullElem.collect()(0).isNullAt(0))
  }

  test("SQL registration: vec_dot / vec_cosine callable from SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1d,2d,3d), array(4d,5d,6d)) AS d,
                vec_cosine(array(1d,0d), array(1d,0d)) AS c""").collect()(0)
    assert(r.getDouble(0) == 32.0 && r.getDouble(1) == 1.0)
  }

  test("hyperplane_bucket bit-identical to the HOF sign-bucket tower") {
    import graft.operators.Similarity
    val vecs = (0 until 40).map(i => Tuple1(vec(i, 64))).toDF("v")
    val rows = vecs.select(
      Similarity.hyperplaneBucket($"v", 8).as("fast"),
      Similarity.hyperplaneBucketHof($"v", 8).as("slow"),
      Similarity.hyperplaneBucket($"v", 6).as("fast6"),
      Similarity.hyperplaneBucketHof($"v", 6).as("slow6")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1))
      assert(r.getInt(2) == r.getInt(3))
    }
    // buckets actually spread (not all-zero / constant)
    assert(rows.map(_.getInt(0)).distinct.length > 5)
  }

  test("generated code actually compiles (no silent interpreted fallback)") {
    // with fallback disabled, a Janino failure (e.g. referencing the
    // nonexistent `VectorOps.MODULE$`) throws instead of quietly running
    // the whole stage interpreted — this is the regression test for that
    GraftFunctions.register(spark)
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = pairs.select(
        VectorOps.vec_dot($"a", $"b").as("d"),
        VectorOps.vec_cosine($"a", $"b").as("c"),
        VectorOps.hyperplane_bucket($"a", 8).as("h"),
        expr("rolling_fingerprint(cast(a[0] as string))").as("f"),
        expr("wkt_point('POINT (1.5 2.5)')").as("w")).collect()
      assert(r.length == 50)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("interpreted eval matches codegen (helper is shared)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(1.0, 2.0, 3.0))
    val b = ArrayData.toArrayData(Array(4.0, 5.0, 6.0))
    assert(VectorOps.dot(a, b) == 32.0)
    assert(math.abs(VectorOps.cosine(a, a) - 1.0) < 1e-15)
  }
}
