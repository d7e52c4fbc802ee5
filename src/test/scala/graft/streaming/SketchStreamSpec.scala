package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Streaming theta-sketch maintenance: cross-batch state through one
  * long-lived query (the PackStreamSpec restart lesson), batch-slicing
  * invariance down to the BYTES (exact-mode compact images store sorted
  * hashes), and the stored-state round trip into SketchStats.
  */
class SketchStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("batch mode equals COUNT(DISTINCT) per key in exact mode") {
    val rows = Seq(
      ("a", "x"), ("a", "y"), ("a", "x"), ("b", "x"),
      ("b", "z"), ("b", "z"), ("c", "w")).toDF("k", "v")
    val got = SketchStream.thetaByKey(rows, "k", "v")
      .collect().map(u => u.key -> (u.est, u.upto)).toMap
    assert(got == Map("a" -> (2.0, 1L), "b" -> (2.0, 1L), "c" -> (1.0, 1L)))
  }

  test("cross-batch state folds; final bytes equal the one-shot batch fold") {
    implicit val sq = spark.sqlContext
    val all = Seq(("a", "x"), ("a", "y"), ("b", "p"), ("a", "z"),
      ("b", "q"), ("a", "x"), ("b", "p"))
    val in = MemoryStream[(String, String)]
    val name = "sketch_stream_spec"
    val q = SketchStream.thetaByKey(in.toDF().toDF("k", "v"), "k", "v")
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(all.take(3))
      q.processAllAvailable()
      in.addData(all.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val latest = SketchStream.latestStates(spark.table(name))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    // distinct: a → {x,y,z}, b → {p,q}
    assert(math.round(graft.operators.SketchStats
      .thetaEstimate(latest("a"))) == 3L)
    assert(math.round(graft.operators.SketchStats
      .thetaEstimate(latest("b"))) == 2L)
    // exact-mode determinism: state bytes equal a one-shot batch fold,
    // regardless of how the stream sliced the arrivals
    val oneShot = SketchStream.thetaByKey(all.toDF("k", "v"), "k", "v")
      .collect().map(u => u.key -> u.theta).toMap
    assert(latest("a").toSeq == oneShot("a").toSeq)
    assert(latest("b").toSeq == oneShot("b").toSeq)
    // two batches touched key a and key b both times
    val uptos = spark.table(name).groupBy("key")
      .agg(max("upto")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uptos == Map("a" -> 2L, "b" -> 2L))
  }

  test("kllByKey: cross-batch quantiles equal the one-shot fold (exact mode)") {
    implicit val sq = spark.sqlContext
    val all = Seq(("a", 1.0), ("a", 9.0), ("b", 5.0), ("a", 3.0),
      ("a", 7.0), ("b", 6.0), ("a", 5.0))
    val in = MemoryStream[(String, Double)]
    val name = "kll_stream_spec"
    val q = SketchStream.kllByKey(in.toDF().toDF("k", "v"), "k", "v")
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(all.take(3)); q.processAllAvailable()
      in.addData(all.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val latest = SketchStream.latestStates(spark.table(name), "kll")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val ranks = Seq(0.25, 0.5, 0.75)
    // inclusive quantiles over a = {1,3,5,7,9}: p25=3, p50=5, p75=7
    assert(graft.operators.SketchStats.kllQuantiles(latest("a"), ranks)
      == Seq(3.0, 5.0, 7.0))
    assert(graft.operators.SketchStats.kllQuantiles(latest("b"), ranks)
      == Seq(5.0, 5.0, 6.0))
    // quantile (not byte) invariance vs a one-shot batch fold
    val oneShot = SketchStream.kllByKey(all.toDF("k", "v"), "k", "v")
      .collect().map(u => u.key -> u.kll).toMap
    for (k <- Seq("a", "b"))
      assert(graft.operators.SketchStats.kllQuantiles(latest(k), ranks)
        == graft.operators.SketchStats.kllQuantiles(oneShot(k), ranks))
    // n folded across batches
    val ns = spark.table(name).groupBy("key").agg(max("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ns == Map("a" -> 5L, "b" -> 2L))
  }

  test("cmsByKey: cross-batch counts; bytes equal the one-shot fold") {
    implicit val sq = spark.sqlContext
    val all = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("a", "z"),
      ("a", "x"), ("b", "y"))
    val in = MemoryStream[(String, String)]
    val name = "cms_stream_spec"
    val q = SketchStream.cmsByKey(in.toDF().toDF("k", "v"), "k", "v")
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(all.take(3)); q.processAllAvailable()
      in.addData(all.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val latest = SketchStream.latestStates(spark.table(name), "cms")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    def cms(b: Array[Byte]) =
      org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(b))
    assert(cms(latest("a")).estimateCount("x") == 3L)
    assert(cms(latest("a")).estimateCount("z") == 1L)
    assert(cms(latest("b")).estimateCount("y") == 2L)
    // cellwise-additive merge ⇒ byte equality with the one-shot fold
    val oneShot = SketchStream.cmsByKey(all.toDF("k", "v"), "k", "v")
      .collect().map(u => u.key -> u.cms).toMap
    assert(latest("a").toSeq == oneShot("a").toSeq)
    assert(latest("b").toSeq == oneShot("b").toSeq)
  }

  test("stored-state round trip answers from parquet") {
    val rows = Seq(("s1", "d1"), ("s1", "d2"), ("s2", "d1")).toDF("k", "v")
    val states = SketchStream.latestStates(
      SketchStream.thetaByKey(rows, "k", "v").toDF())
      .withColumnRenamed("key", "source")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_states/" +
      "sketch_stream_spec_rt"
    graft.operators.SketchStats.saveStates(states, path)
    val got = graft.operators.SketchStats.loadStates(spark, path)
      .collect().map(r => r.getString(0) -> math.round(
        graft.operators.SketchStats.thetaEstimate(
          r.getAs[Array[Byte]](1)))).toMap
    assert(got == Map("s1" -> 2L, "s2" -> 1L))
  }
}
