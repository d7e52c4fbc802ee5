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
        VectorOps.sig_agree(
          expr("transform(a, x -> cast(x * 1000 as bigint))"),
          expr("transform(b, x -> cast(x * 1000 as bigint))")).as("s"),
        expr("wkt_point('POINT (1.5 2.5)')").as("w")).collect()
      assert(r.length == 50)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("sig_agree matches the HOF signature-similarity on long arrays") {
    import graft.operators.Dedup
    def sig(seed: Int, n: Int): Array[Long] =
      Array.tabulate(n)(i => ((seed * 2654435761L + i * 40503L + seed * i * 17L) % 5) - 2)
    // 5-value range forces plenty of agreeing positions
    val sigs = (0 until 60).map(i => (sig(i, 64), sig(i + 7, 64))).toDF("a", "b")
    val rows = sigs.select(
      Dedup.signatureSimilarity($"a", $"b").as("fast"),
      Dedup.signatureSimilarityHof($"a", $"b").as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows.exists(r => r.getDouble(0) > 0 && r.getDouble(0) < 1))

    // mismatched lengths and null elements: HOF parity (pad = disagree,
    // denominator = size(a))
    GraftFunctions.register(spark)
    val edge = spark.sql(
      """SELECT sig_agree(array(1L,2L,3L,4L), array(1L,2L)) AS longer_a,
                sig_agree(array(1L,2L), array(1L,2L,3L,4L)) AS longer_b,
                sig_agree(array(1L, CAST(NULL AS BIGINT)), array(1L,2L)) AS null_el""")
    val hofEdge = Seq(
      (Array(1L, 2L, 3L, 4L), Array(1L, 2L)),
      (Array(1L, 2L), Array(1L, 2L, 3L, 4L))).toDF("a", "b")
      .select(Dedup.signatureSimilarityHof($"a", $"b")).collect()
    val e = edge.collect()(0)
    assert(e.getDouble(0) == hofEdge(0).getDouble(0)) // 2/4
    assert(e.getDouble(1) == hofEdge(1).getDouble(0)) // 2/2
    assert(e.getDouble(2) == 0.5)
  }

  test("interpreted eval matches codegen (helper is shared)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(1.0, 2.0, 3.0))
    val b = ArrayData.toArrayData(Array(4.0, 5.0, 6.0))
    assert(VectorOps.dot(a, b) == 32.0)
    assert(math.abs(VectorOps.cosine(a, a) - 1.0) < 1e-15)
  }
}
