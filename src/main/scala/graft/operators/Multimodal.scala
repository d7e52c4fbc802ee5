package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` payloads plus typed metadata, with batch-shaped
  * feature extraction over partitions.
  *
  * The IMAGE path is REAL (round 8): PNG/JPEG payloads decode through
  * the JDK's `javax.imageio` inside the per-partition batch boundary —
  * no external library — yielding dimensions, channel count, and
  * per-channel statistics ([[decodeImageStats]]), with encode available
  * too ([[encodePng]]) so round-trip pipelines are testable end-to-end.
  * Audio/video decode remains a deterministic stand-in ([[FakeCodec]]:
  * no audio/video codecs exist in the JDK or this container) behind the
  * same signature a JNI/FFI decoder would have — swapping one in
  * changes one function.
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

  /** Decoded image statistics: dimensions, raster channel count, and
    * exact per-channel pixel sums (sums, not means — integers hash
    * identically across engines, which is what lets a SQL oracle check
    * a real binary decode).
    */
  final case class ImageStats(
      width: Int, height: Int, channels: Int,
      nPx: Long, sumR: Long, sumG: Long, sumB: Long)

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP — no
    * external library). Returns None for undecodable payloads — the
    * caller decides the fallback. Channel sums come from `getRGB`
    * (sRGB, non-premultiplied), so grayscale decodes as r=g=b and RGBA
    * alpha never distorts the color sums; `channels` reports the
    * raster's band count (1 gray / 3 RGB / 4 RGBA).
    *
    * Scale note: this runs per row inside a `mapPartitions` batch — the
    * decoder shape for a 100 TB corpus is unchanged from the stub era
    * (opaque bytes in, fixed-width features out, no shuffle). getRGB
    * per pixel is the clarity choice; a production hot path would grab
    * the raster's data buffer per image instead.
    */
  def decodeImageStats(content: Array[Byte]): Option[ImageStats] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      val bands = raster.getNumBands
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (bands <= 2) {
            // gray (+alpha): read the sample directly — getRGB would
            // push linear gray through the sRGB gamma curve and inflate
            // every sum (128 → ~188)
            val v = raster.getSample(x, y, 0)
            sr += v; sg += v; sb += v
          } else {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
          }
          x += 1
        }
        y += 1
      }
      Some(ImageStats(w, h, bands, w.toLong * h, sr, sg, sb))
    }
  }

  /** PNG encode via ImageIO — the write half of the round-trip. */
  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** ==== STUBBED CODEC (audio/video only — images are real above) ====
    * Deterministic stand-in for an audio/video decoder (none exists in
    * the JDK). Real implementation would decode `content` (WAV/MP4...)
    * and produce sample tensors; this fake derives a fixed-dimension
    * feature vector from the raw bytes so the full pipeline is testable
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

  // ==== real image pipeline =============================================

  /** One decoded image row keyed by file name ([[imageFeatures]]). */
  final case class ImageFileFeatures(
      file_name: String, width: Int, height: Int, channels: Int,
      n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** One decoded image row keyed by doc id ([[imageFeaturesById]]). */
  final case class ImageDocFeatures(
      doc_id: Long, width: Int, height: Int, channels: Int,
      n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Decode stats for a directory/glob of image FILES: `binaryFile`
    * scan → per-partition ImageIO decode → one stats row per decodable
    * image (undecodable files are dropped — at 100 TB a crawl dir always
    * carries some junk; count them upstream if the drop rate matters).
    * The binaryFile source is exactly how an object-store image corpus
    * lands in Spark, so this is the production read path in miniature.
    */
  def imageFeatures(spark: SparkSession, pathGlob: String): Dataset[ImageFileFeatures] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
              col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (name, bytes) =>
        decodeImageStats(bytes).map(s => ImageFileFeatures(
          name, s.width, s.height, s.channels,
          s.nPx, s.sumR, s.sumG, s.sumB))
      })
  }

  /** Decode stats for an in-pipeline (id, content) frame — same decode,
    * keyed by doc id instead of file name.
    */
  def imageFeaturesById(spark: SparkSession, media: DataFrame,
                        idCol: String = "doc_id",
                        contentCol: String = "content"): Dataset[ImageDocFeatures] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeImageStats(bytes).map(s => ImageDocFeatures(
          id, s.width, s.height, s.channels,
          s.nPx, s.sumR, s.sumG, s.sumB))
      })
  }

  /** Synthesize a REAL png corpus from the documents table: one
    * two-tone RGB image per doc, dimensions and both colors integer
    * functions of `doc_id` — so every decode statistic is exact integer
    * arithmetic a SQL oracle reproduces without ever seeing a pixel
    * (sum_r = h·(wL·rA + (w−wL)·rB), etc.). Encode runs per partition
    * through ImageIO; payloads come back as opaque binary, the shape
    * every downstream multimodal operator consumes.
    */
  def synthesizeImages(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val w = ((id % 16) * 4 + 8).toInt
      val h = ((id % 12) * 4 + 8).toInt
      val rA = ((id * 13) % 256).toInt
      val gA = ((id * 7 + 31) % 256).toInt
      val bA = ((id * 29 + 17) % 256).toInt
      val rB = 255 - rA; val gB = 255 - gA; val bB = 255 - bA
      val wL = w / 2
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = if (x < wL) (rA, gA, bA) else (rB, gB, bB)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      (id, encodePng(img))
    }).toDF("doc_id", "content")
  }

  /** ==== STUBBED TRANSFORMS over the real plumbing ==== */

  /** REAL image resize: decode → Graphics2D bilinear scale → PNG
    * re-encode, per partition (the decode/encode batch boundary — same
    * shape as feature extraction). Rows whose payload doesn't decode
    * pass through unchanged with a `resized=false` marker column, so a
    * partly-junk corpus keeps flowing. Contract (spec-pinned): every
    * resized payload decodes to exactly (w, h).
    */
  def resizeImages(spark: SparkSession, media: DataFrame, w: Int, h: Int,
                   idCol: String = "doc_id",
                   contentCol: String = "content"): DataFrame = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) (id, bytes, false)
        else {
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          (id, encodePng(out), true)
        }
      }).toDF(idCol, contentCol, "resized")
  }

  /** "Resize": deterministic fake of an image resize — metadata updated,
    * payload re-sampled to a target byte budget proportional to the new
    * area (real image payloads should use [[resizeImages]]; this
    * projection form remains for the synthetic audio/video stand-ins).
    * Runs as a codegen-friendly projection; no shuffle.
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
    *
    * Image rows take the REAL decode ([[decodeImageStats]]): features =
    * [width, height, channels, mean_r, mean_g, mean_b, luma_mean, 1].
    * Rows whose payload isn't a decodable image — and all audio/video —
    * fall back to [[FakeCodec]] (last slot 0 marks the fake path), so a
    * mixed or partly-corrupt corpus still features end-to-end.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val balanced =
      if (partitions > 0) media.repartition(partitions, col("doc_id"))
      else media
    balanced.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val real =
          if (r.media_type == "image") decodeImageStats(r.content) else None
        val feats = real match {
          case Some(s) =>
            val n = math.max(1L, s.nPx).toFloat
            val mr = s.sumR / n; val mg = s.sumG / n; val mb = s.sumB / n
            Array(s.width.toFloat, s.height.toFloat, s.channels.toFloat,
              mr, mg, mb, 0.299f * mr + 0.587f * mg + 0.114f * mb, 1.0f)
          case None => FakeCodec.decodeAndFeaturize(r.content)
        }
        MediaFeatures(
          doc_id = r.doc_id,
          media_type = r.media_type,
          n_bytes = r.content.length,
          checksum = FakeCodec.checksum(r.content),
          features = feats)
      }
    }
  }
}
