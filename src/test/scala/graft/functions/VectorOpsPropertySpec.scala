package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property-style checks over seeded random inputs (fixed seed — the
  * cases are reproducible, just broader than hand-picked vectors):
  * algebraic identities that must hold EXACTLY in IEEE arithmetic, and
  * parity across dimensions/shapes the targeted tests don't cover.
  */
class VectorOpsPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)
  private def randVec(n: Int): Array[Double] =
    Array.fill(n)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(6) - 3))

  test("dot commutes exactly; cosine(a,a)=1 within one ulp; |cosine|<=1+eps") {
    val dims = Seq(1, 2, 3, 7, 64, 256, 1000)
    val pairs = dims.flatMap { n =>
      (0 until 5).map(_ => (randVec(n), randVec(n)))
    }.toDF("a", "b")
    val rows = pairs.select(
      VectorOps.vec_dot($"a", $"b").as("ab"),
      VectorOps.vec_dot($"b", $"a").as("ba"),
      VectorOps.vec_cosine($"a", $"a").as("caa"),
      VectorOps.vec_cosine($"a", $"b").as("cab")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot not commutative")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12, s"cos(a,a)=${r.getDouble(2)}")
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-12, s"|cos|>1: ${r.getDouble(3)}")
    }
  }

  test("hyperplane buckets: distribution spreads and is dimension-stable") {
    val vecs = (0 until 200).map(_ => Tuple1(randVec(64))).toDF("v")
    val buckets = vecs.select(VectorOps.hyperplane_bucket($"v", 8)).collect()
      .map(_.getInt(0))
    assert(buckets.forall(b => b >= 0 && b < 256))
    // 200 random vectors over 256 buckets: expect substantial spread
    assert(buckets.distinct.length > 50, s"only ${buckets.distinct.length} buckets")
  }

  test("as-of exec parity vs composed operator across random shapes") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    (0 until 3).foreach { trial =>
      val nKeys = 3 + rnd.nextInt(8)
      val right = (0 until 100 + rnd.nextInt(200)).map { i =>
        (s"k${rnd.nextInt(nKeys)}", ts(rnd.nextInt(500).toLong), i.toDouble)
      }.toDF("k", "t", "v")
      val left = (0 until 100 + rnd.nextInt(300)).map { i =>
        (s"k${rnd.nextInt(nKeys + 2)}", ts(rnd.nextInt(500).toLong), i.toLong)
      }.toDF("k", "t", "id")
      // dedup right on (k, t): equal-timestamp right rows make "latest"
      // payload order-dependent in BOTH implementations (tie broken by
      // sort order, which is non-deterministic for identical sort keys)
      val r1 = right.groupBy("k", "t").agg(max("v").as("v"))
      val a = graft.plans.AsOfJoinExecOp.backward(left, r1, Seq("k"), "t")
        .orderBy("k", "t", "id").collect()
      val b = graft.operators.AsOfJoin.backward(left, r1, Seq("k"), "t")
        .orderBy("k", "t", "id").collect()
      assert(a.sameElements(b), s"trial $trial diverged")
    }
  }
}
