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
