package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class GroupedTopKSamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val scores = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 7.0),
    ("c", 7L, 1.0)).toDF("grp", "id", "score")

  test("GroupedTopK keeps k rows per group, ranked with tiebreak") {
    val top2 = GroupedTopK(scores, Seq("grp"),
        Seq(desc("score"), asc("id")), k = 2)
      .select("grp", "rank", "id")
      .as[(String, Int, Long)].collect().toSet
    assert(top2 == Set(
      ("a", 1, 2L), ("a", 2, 4L), // ties on 30.0 break by id
      ("b", 1, 6L), ("b", 2, 5L),
      ("c", 1, 7L)))
  }

  test("GroupedTopK rank filter plans as WindowGroupLimit (pre-shuffle top-k)") {
    val df = GroupedTopK(scores, Seq("grp"), Seq(desc("score"), asc("id")), 2)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in optimized plan:\n$optimized")
  }

  private val keyed = spark.range(0, 10000).toDF("id")
    .withColumn("stratum", when(col("id") % 3 === 0, "x").otherwise("y"))

  test("moduloSample keeps exactly the keys ≡ r (mod n)") {
    val got = Sampling.moduloSample(keyed, "id", 10, 3)
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == (3L until 10000L by 10L).toSeq)
  }

  test("hashSample is deterministic and close to the target fraction") {
    val a = Sampling.hashSample(keyed, "id", 0.2).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(keyed, "id", 0.2).select("id").as[Long].collect().toSet
    assert(a == b, "hash sample must be deterministic")
    assert(math.abs(a.size / 10000.0 - 0.2) < 0.03, s"fraction off: ${a.size}")
  }

  test("stratifiedHashSample applies per-stratum fractions, drops absent strata") {
    val sampled = Sampling.stratifiedHashSample(
      keyed.withColumn("stratum",
        when(col("id") < 6000, "big").otherwise(
          when(col("id") < 9000, "small").otherwise("absent"))),
      "stratum", "id", Map("big" -> 0.5, "small" -> 0.1))
    val byStratum = sampled.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(!byStratum.contains("absent"))
    assert(math.abs(byStratum("big") / 6000.0 - 0.5) < 0.05)
    assert(math.abs(byStratum("small") / 3000.0 - 0.1) < 0.05)
  }
}
