package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SketchStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = spark.range(0, 10000)
    .select(col("id"),
      (col("id") % 7).cast("string").as("shard"),
      // 2500 distinct keys, each appearing 4 times across shards
      (col("id") % 2500).as("key"))

  test("shard estimates land within HLL error of exact") {
    val sk = SketchStats.shardSketches(df, "shard", "key")
    val per = SketchStats.shardEstimates(sk, "shard")
      .as[(String, Long, Double)].collect()
    val exact = df.groupBy("shard").agg(countDistinct(col("key")).as("e"))
      .as[(String, Long)].collect().toMap
    assert(per.length == 7)
    per.foreach { case (s, _, est) =>
      assert(math.abs(est - exact(s)) <= exact(s) * 0.05,
        s"shard $s: est $est vs exact ${exact(s)}")
    }
  }

  test("merged estimate is shard-layout invariant and near the truth") {
    // the operator's reason to exist: the SAME corpus sharded two
    // different ways must merge to the same estimate (HLL union is
    // associative/commutative over content), with no rescan
    val byShard = SketchStats.shardSketches(df, "shard", "key")
    val alt = df.withColumn("shard", (col("id") % 13).cast("string"))
    val byAlt = SketchStats.shardSketches(alt, "shard", "key")
    val m1 = SketchStats.mergedEstimate(byShard).as[Double].head()
    val m2 = SketchStats.mergedEstimate(byAlt).as[Double].head()
    assert(m1 == m2, s"merge must not depend on shard layout: $m1 vs $m2")
    assert(math.abs(m1 - 2500.0) <= 2500.0 * 0.05)
  }

  test("CMS: merged shard sketches never undercount and bound overcount") {
    val toks = df.select(col("shard"), col("key").cast("string").as("tok"))
    val merged = SketchStats.mergedCms(
      SketchStats.shardCms(toks, "shard", "tok"))
    val exact = toks.groupBy("tok").count()
      .as[(String, Long)].collect().toMap
    val n = 10000L
    val slack = math.ceil(0.001 * n).toLong
    Seq("0", "17", "2499").foreach { t =>
      val est = merged.estimateCount(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(est >= exact(t), s"$t: CMS must never undercount")
      assert(est <= exact(t) + slack, s"$t: $est vs ${exact(t)} + $slack")
    }
    // absent key: bounded by the same slack
    val ghost = merged.estimateCount(
      "no-such-token".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(ghost >= 0L && ghost <= slack)
  }

  test("CMS merge equals the un-sharded sketch on point queries") {
    val toks = df.select(col("shard"), col("key").cast("string").as("tok"))
    val merged = SketchStats.mergedCms(
      SketchStats.shardCms(toks, "shard", "tok"))
    val whole = SketchStats.mergedCms(
      SketchStats.shardCms(toks.withColumn("shard", lit("one")),
        "shard", "tok"))
    Seq("0", "100", "2499", "ghost").foreach { t =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(merged.estimateCount(b) == whole.estimateCount(b),
        s"CMS counters are exact-additive across shards ($t)")
    }
  }

  test("sketch state is deterministic for fixed content") {
    val a = SketchStats.mergedEstimate(
      SketchStats.shardSketches(df, "shard", "key")).as[Double].head()
    val b = SketchStats.mergedEstimate(
      SketchStats.shardSketches(df.repartition(17), "shard", "key"))
      .as[Double].head()
    assert(a == b, "content-determined: partitioning must not change it")
  }
}
