package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "hello world"),
    (1L, "abc"),
    (2L, "")).toDF("doc_id", "text")

  test("synthesizeMedia: binary payload + typed metadata schema") {
    val m = Multimodal.synthesizeMedia(docs)
    val schema = m.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("content") == "binary")
    assert(schema("media_type") == "string")
    assert(schema("width") == "int" && schema("height") == "int")
    val types = m.orderBy("doc_id").select("media_type").as[String].collect()
    assert(types.toSeq == Seq("image", "audio", "video"))
  }

  test("extractFeatures: deterministic, correct byte counts, fixed dim") {
    val feats = Multimodal
      .extractFeatures(spark, Multimodal.synthesizeMedia(docs), partitions = 2)
      .collect().sortBy(_.doc_id)
    assert(feats.map(_.n_bytes).toSeq == Seq(11, 3, 0))
    assert(feats.forall(_.features.length == Multimodal.FakeCodec.featureDim))
    // deterministic across runs
    val again = Multimodal
      .extractFeatures(spark, Multimodal.synthesizeMedia(docs), partitions = 3)
      .collect().sortBy(_.doc_id)
    feats.zip(again).foreach { case (a, b) =>
      assert(a.checksum == b.checksum)
      assert(a.features.toSeq == b.features.toSeq)
    }
  }

  test("feature vector is a normalized byte histogram (sums to ~1)") {
    val f = Multimodal
      .extractFeatures(spark, Multimodal.synthesizeMedia(docs.filter($"doc_id" === 0L)))
      .head()
    assert(math.abs(f.features.sum - 1.0f) < 1e-5)
  }
}
