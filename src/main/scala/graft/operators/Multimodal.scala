package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` payloads plus typed metadata, with batch-shaped
  * feature extraction over partitions.
  *
  * The Spark-side machinery here is REAL and tested — schema, balanced
  * repartitioning before the expensive stage, per-partition batched
  * iteration, typed Dataset boundary. The codec itself is a STUB
  * ([[FakeCodec]]): this container has no image/audio libraries, so
  * decode is a deterministic fake with the same signature a JNI/FFI
  * decoder would have. Swapping in a real codec changes one function.
  */
object Multimodal {

  /** One media row: payload + metadata. In production the payload is an
    * image/audio/video blob; here it is synthesized deterministically
    * from the documents table.
    */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      content: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      checksum: Long,
      features: Array[Float])

  /** ==== STUBBED CODEC ====
    * Deterministic stand-in for an image/audio decoder. Real
    * implementation would decode `content` (JPEG/PNG/WAV...) and produce
    * pixel/sample tensors; this fake derives a fixed-dimension feature
    * vector from the raw bytes so the full pipeline is testable
    * end-to-end with reproducible outputs.
    */
  object FakeCodec {
    val featureDim = 8

    def decodeAndFeaturize(content: Array[Byte]): Array[Float] = {
      // "resize + pool": bucket byte histogram into featureDim bins.
      val bins = new Array[Float](featureDim)
      var i = 0
      while (i < content.length) {
        bins((content(i) & 0xff) % featureDim) += 1.0f
        i += 1
      }
      val n = math.max(1, content.length).toFloat
      bins.map(_ / n)
    }

    def checksum(content: Array[Byte]): Long = {
      var h = 0L
      var i = 0
      while (i < content.length) {
        h = h * 31 + (content(i) & 0xff)
        i += 1
      }
      h
    }
  }

  /** ==== STUBBED TRANSFORMS over the real plumbing ==== */

  /** "Resize": deterministic fake of an image resize — metadata updated,
    * payload re-sampled to a target byte budget proportional to the new
    * area (a real codec swaps in at the marked line). Runs as a
    * codegen-friendly projection; no shuffle.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val budget = math.max(1, (w * h) / 64)
    media
      .withColumn("width", lit(w))
      .withColumn("height", lit(h))
      // STUB: real implementation decodes + resamples pixels here
      .withColumn("content",
        expr(s"substring(content, 1, $budget)"))
  }

  /** Frame sampling for `video` rows: each video becomes `nFrames` rows
    * with a frame index and a per-frame payload slice (STUB for real
    * frame extraction). posexplode keeps it one distributed pass;
    * non-video rows pass through with frame 0.
    */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    val videos = media.filter(col("media_type") === "video")
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        posexplode(expr(
          s"""transform(sequence(0, ${nFrames - 1}),
              i -> substring(content, 1 + i * greatest(1, octet_length(content) div $nFrames),
                             greatest(1, octet_length(content) div $nFrames)))"""))
          .as(Seq("frame_no", "content")))
    val rest = media.filter(col("media_type") =!= "video")
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
              lit(0).as("frame_no"), col("content"))
    videos.unionByName(rest)
  }

  /** Synthesize a media table from documents: UTF-8 payload bytes plus
    * deterministic metadata. (Stand-in for `spark.read.format("binaryFile")`
    * over an object store at production scale.)
    */
  def synthesizeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      (pmod(col("doc_id"), lit(64)) * 16 + 64).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) * 16 + 64).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("content"))

  /** Batch-shaped feature extraction: repartition for balance (decode is
    * the expensive stage — never let file layout skew it), then decode
    * per partition through the typed boundary.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val balanced =
      if (partitions > 0) media.repartition(partitions, col("doc_id"))
      else media
    balanced.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        MediaFeatures(
          doc_id = r.doc_id,
          media_type = r.media_type,
          n_bytes = r.content.length,
          checksum = FakeCodec.checksum(r.content),
          features = FakeCodec.decodeAndFeaturize(r.content))
      }
    }
  }
}
