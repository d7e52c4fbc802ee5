package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class CurationStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private val prose =
    "the cat and the dog in a house of it that is the story " * 3

  test("curate drops low-quality docs and collapses exact duplicates") {
    val docs = Seq(
      (1L, prose),          // survives
      (2L, prose),          // exact dup of 1 → collapsed
      (3L, "zzz qqq"),      // quality ≈ 0.01 → dropped
      (4L, prose + "tail")  // distinct content → survives
    ).toDF("doc_id", "text")
    val got = CurationStream.curate(docs).collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[String]("fp")).distinct.length == 2)
    assert(got.forall(_.getAs[Double]("quality") >= 0.35))
  }

  test("streaming availableNow run equals the batch plan on real data") {
    val streamed = CurationStream.curate(
      EventsStream.readTable(spark, sf, "documents"))
    val got = EventsStream.runToCompletion(spark, streamed, "append")
      .groupBy("predicted")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("tok"))
      .orderBy("predicted").collect()
    val batch = CurationStream.curate(graft.Tables.documents(spark, sf))
      .groupBy("predicted")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("tok"))
      .orderBy("predicted").collect()
    assert(got.length == batch.length && got.nonEmpty)
    got.zip(batch).foreach { case (g, b) => assert(g == b) }
  }
}
