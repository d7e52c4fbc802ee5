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

  test("temperatureMixRates: α=0.5 flattens a skewed mix toward sqrt shares") {
    // 8000/1500/500 split; at α=0.5 shares ∝ sqrt(n): the small stratum's
    // target share rises from 5% to ~16%, the big one falls from 80% to ~65%
    val df = spark.range(10000).select(col("id"),
      when(col("id") < 8000, "big")
        .otherwise(when(col("id") < 9500, "mid").otherwise("small"))
        .as("stratum"))
    val rates = Sampling.temperatureMixRates(df, "stratum", alpha = 0.5,
        budget = 1000L)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    val sw = math.sqrt(8000) + math.sqrt(1500) + math.sqrt(500)
    assert(math.abs(rates("big")._3 - 1000.0 * math.sqrt(8000) / sw / 8000) < 1e-6)
    assert(math.abs(rates("small")._3 - 1000.0 * math.sqrt(500) / sw / 500) < 1e-6)
    // flatter than raw: per-row keep rate strictly higher for small strata
    assert(rates("small")._3 > rates("mid")._3 && rates("mid")._3 > rates("big")._3)

    val sampled = Sampling.temperatureSample(df, "stratum", "id",
      Sampling.temperatureMixRates(df, "stratum", alpha = 0.5, budget = 1000L))
    val n = sampled.groupBy("stratum").count().as[(String, Long)].collect().toMap
    // deterministic md5 filter lands within 15% of the target share
    assert(math.abs(n("big") - 1000 * math.sqrt(8000) / sw) / (1000 * math.sqrt(8000) / sw) < 0.15)
    val again = Sampling.temperatureSample(df, "stratum", "id",
      Sampling.temperatureMixRates(df, "stratum", alpha = 0.5, budget = 1000L))
      .agg(org.apache.spark.sql.functions.sum("id")).as[Long].head()
    assert(again == sampled.agg(org.apache.spark.sql.functions.sum("id")).as[Long].head(),
      "content-keyed sample must be replayable")
  }

  test("clusterBalance: caps every cell, keeps the ordering's winners") {
    val corpus = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"), col("label"))
    val kept = Sampling.clusterBalance(corpus, nCells = 8, cap = 10,
      ordering = Seq(col("label").desc, col("vec_id").asc))
    val perCell = kept.groupBy("cell").count().as[(Long, Long)]
      .collect().toMap
    assert(perCell.values.forall(_ <= 10), s"cap violated: $perCell")
    assert(perCell.values.sum < corpus.count(), "cap should bind somewhere")
    // within a cell, every kept label >= every dropped label (ordering
    // keeps winners; vec_id only breaks ties)
    val assigned = Similarity.ivfAssign(corpus, 8)
      .select(col("ivf_id").as("vec_id"), col("cell"))
    val labels = corpus.join(assigned, "vec_id")
      .join(kept.select(col("vec_id"), lit(true).as("kept")),
        Seq("vec_id"), "left")
      .select(col("cell"), col("label"), coalesce(col("kept"), lit(false)))
      .as[(Long, Int, Boolean)].collect()
    labels.groupBy(_._1).foreach { case (cell, rows) =>
      val (k, d) = rows.partition(_._3)
      if (d.nonEmpty && k.nonEmpty)
        assert(k.map(_._2).min >= d.map(_._2).max,
          s"cell $cell kept a lower label than it dropped")
    }
    // retry/repartition stability: same result from a reshuffled corpus
    val again = Sampling.clusterBalance(corpus.repartition(13), nCells = 8,
        cap = 10, ordering = Seq(col("label").desc, col("vec_id").asc))
      .agg(org.apache.spark.sql.functions.sum("vec_id")).as[Long].head()
    assert(again ==
      kept.agg(org.apache.spark.sql.functions.sum("vec_id")).as[Long].head())
  }

  test("clusterBalance plans as WindowGroupLimit (per-partition top-cap)") {
    val corpus = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"), col("label"))
    val plan = Sampling.clusterBalance(corpus, nCells = 8, cap = 10,
        ordering = Seq(col("label").desc, col("vec_id").asc))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }
}
