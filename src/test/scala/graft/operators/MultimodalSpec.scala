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

  test("resize updates metadata and bounds payload to the area budget") {
    val m = Multimodal.synthesizeMedia(docs)
    val resized = Multimodal.resize(m, 128, 128).collect()
    resized.foreach { r =>
      assert(r.getAs[Int]("width") == 128 && r.getAs[Int]("height") == 128)
      assert(r.getAs[Array[Byte]]("content").length <= 128 * 128 / 64)
    }
  }

  test("sampleFrames explodes videos into frame rows, passes others through") {
    val bigDocs = Seq((2L, "x" * 40)).toDF("doc_id", "text")  // doc 2 -> video
      .unionByName(docs.filter($"doc_id" =!= 2L))
    val m = Multimodal.synthesizeMedia(bigDocs)
    val framed = Multimodal.sampleFrames(m, 4)
    val videos = framed.filter($"media_type" === "video").collect()
    assert(videos.length == 4)
    assert(videos.map(_.getAs[Int]("frame_no")).sorted.toSeq == Seq(0, 1, 2, 3))
    // frames partition the payload deterministically
    assert(videos.forall(_.getAs[Array[Byte]]("content").length == 10))
    val rest = framed.filter($"media_type" =!= "video")
    assert(rest.count() == 2 &&
      rest.collect().forall(_.getAs[Int]("frame_no") == 0))
  }

  test("feature vector is a normalized byte histogram (sums to ~1)") {
    val f = Multimodal
      .extractFeatures(spark, Multimodal.synthesizeMedia(docs.filter($"doc_id" === 0L)))
      .head()
    assert(math.abs(f.features.sum - 1.0f) < 1e-5)
  }
}
