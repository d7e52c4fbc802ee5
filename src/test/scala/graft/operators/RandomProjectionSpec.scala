package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[Similarity.randomProjection]] — deterministic ±1 JL sketch. */
class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val inDim = 16
  private val outDim = 8

  // 200 deterministic pseudo-vectors (hash-derived components in [-1,1])
  private lazy val vecs = (0 until 200).map { v =>
    (v.toLong, (0 until inDim).map { i =>
      (((v * 31 + i) * 2654435761L % 2000) / 1000.0 - 1.0).toFloat
    })
  }

  private def norm2(xs: Seq[Double]): Double = xs.map(x => x * x).sum

  test("sign matrix is ±1, deterministic, and seed-sensitive") {
    val a = Similarity.projectionSigns(inDim, outDim)
    val b = Similarity.projectionSigns(inDim, outDim)
    assert(a == b)
    assert(a.flatten.forall(v => v == 1.0 || v == -1.0))
    assert(a != Similarity.projectionSigns(inDim, outDim, seed = "other"))
    // not degenerate: both signs occur
    assert(a.flatten.distinct.toSet == Set(1.0, -1.0))
  }

  test("norms are preserved in expectation (JL)") {
    val df = vecs.toDF("vec_id", "embedding")
    val proj = Similarity.randomProjection(df, "embedding", inDim, outDim)
      .select(col("vec_id"), array((0 until outDim).map(j => col(s"p$j")): _*)
        .as("y"), col("embedding"))
      .as[(Long, Seq[Double], Seq[Float])].collect()
    val ratios = proj.map { case (_, y, x) =>
      norm2(y) / norm2(x.map(_.toDouble))
    }
    val mean = ratios.sum / ratios.length
    // E[‖y‖²] = ‖x‖²; at m=8 per-vector variance is large but the
    // 200-vector mean concentrates
    assert(math.abs(mean - 1.0) < 0.15, s"mean norm ratio $mean")
    // each individual ratio is positive and finite
    assert(ratios.forall(r => r > 0 && !r.isNaN && !r.isInfinite))
  }

  test("pairwise distances are preserved in expectation") {
    val df = vecs.toDF("vec_id", "embedding")
    val proj = Similarity.randomProjection(df, "embedding", inDim, outDim)
      .select(col("vec_id"), array((0 until outDim).map(j => col(s"p$j")): _*)
        .as("y"), col("embedding"))
      .as[(Long, Seq[Double], Seq[Float])].collect()
      .sortBy(_._1)
    val pairs = (0 until 100).map(i => (proj(i), proj(i + 100)))
    val ratios = pairs.map { case ((_, ya, xa), (_, yb, xb)) =>
      val dy = norm2(ya.zip(yb).map { case (p, q) => p - q })
      val dx = norm2(xa.zip(xb).map { case (p, q) => (p - q).toDouble })
      dy / dx
    }
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.2, s"mean distance ratio $mean")
  }

  test("projection is a pure function of content (repartition-stable)") {
    val df = vecs.toDF("vec_id", "embedding")
    val a = Similarity.randomProjection(df, "embedding", inDim, outDim)
      .select(col("vec_id"), col("p0"), col("p7"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val b = Similarity.randomProjection(df.repartition(13), "embedding",
        inDim, outDim)
      .select(col("vec_id"), col("p0"), col("p7"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(a == b)
  }
}
