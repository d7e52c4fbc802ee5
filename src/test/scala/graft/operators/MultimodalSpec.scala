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
    assert(feats.forall(_.features.length == Multimodal.featureDim))
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

  test("decodeImageStats: solid-color PNG and JPEG round-trip") {
    val img = new java.awt.image.BufferedImage(
      8, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 5).foreach(y => (0 until 8).foreach(x =>
      img.setRGB(x, y, (200 << 16) | (100 << 8) | 50)))
    val png = Multimodal.decodeImageStats(Multimodal.encodePng(img)).get
    assert(png.width == 8 && png.height == 5 && png.channels == 3)
    assert(png.sumR == 200L * 40 && png.sumG == 100L * 40 && png.sumB == 50L * 40)
    // JPEG is lossy: dims/channels exact, solid-color means near-exact
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpg = Multimodal.decodeImageStats(bos.toByteArray).get
    assert(jpg.width == 8 && jpg.height == 5 && jpg.channels == 3)
    assert(math.abs(jpg.sumR / 40.0 - 200) < 8 &&
           math.abs(jpg.sumG / 40.0 - 100) < 8 &&
           math.abs(jpg.sumB / 40.0 - 50) < 8)
    assert(Multimodal.decodeImageStats("not an image".getBytes).isEmpty)
  }

  test("extractFeatures: real decode on image rows, fake fallback elsewhere") {
    // doc 0 -> media_type image with a REAL png payload; decode flag
    // (last feature slot) must be 1 and dims must match the payload
    val png = {
      val img = new java.awt.image.BufferedImage(
        6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 4).foreach(y => (0 until 6).foreach(x =>
        img.setRGB(x, y, (10 << 16) | (20 << 8) | 30)))
      Multimodal.encodePng(img)
    }
    val media = Seq((0L, "image", 6, 4, png),
                    (1L, "audio", 8, 8, Array[Byte](1, 2, 3)),
                    (3L, "image", 2, 2, Array[Byte](9, 9)))  // junk image
      .toDF("doc_id", "media_type", "width", "height", "content")
    val by = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.doc_id -> f.features).toMap
    assert(by(0L)(7) == 1.0f, "real image payload must take the real path")
    assert(by(0L).take(6).toSeq == Seq(6f, 4f, 3f, 10f, 20f, 30f))
    assert(by(1L)(7) != 1.0f || by(1L).sum <= 1.0f + 1e-5)  // fake path histogram
    assert(by(3L).sum > 0.999f && by(3L).sum < 1.001f,
      "undecodable image payload must fall back to the fake histogram")
  }

  test("resizeImages: every decodable payload decodes to the target dims") {
    val imgs = Multimodal.synthesizeImages(spark,
      Seq(1L, 2L, 3L).toDF("doc_id"))
      .unionByName(Seq((99L, Array[Byte](1, 2, 3)))
        .toDF("doc_id", "content"))
    val out = Multimodal.resizeImages(spark, imgs, 12, 10).collect()
    out.filter(_.getAs[Boolean]("resized")).foreach { r =>
      val s = Multimodal.decodeImageStats(r.getAs[Array[Byte]]("content")).get
      assert(s.width == 12 && s.height == 10)
    }
    assert(out.count(_.getAs[Boolean]("resized")) == 3)
    assert(!out.find(_.getAs[Long]("doc_id") == 99L).get
      .getAs[Boolean]("resized"))
  }

  test("decodeWavStats: stereo PCM-16 round-trip, junk rejected") {
    // interleaved stereo: L ramp 0,2,4..., R constant -7
    val n = 50
    val samples = Array.tabulate[Short](n * 2)(i =>
      if (i % 2 == 0) (i).toShort else (-7).toShort)
    val wav = Multimodal.encodeWavPcm16(samples, 2, 16000)
    val s = Multimodal.decodeWavStats(wav).get
    assert(s.sampleRate == 16000 && s.channels == 2 && s.bits == 16)
    assert(s.nFrames == n)
    assert(s.sumL == (0 until n).map(_ * 2).sum)
    assert(s.sumR == -7L * n)
    assert(Multimodal.decodeWavStats("not audio".getBytes).isEmpty)
  }

  test("extractFeatures: real decode on audio rows (wav payload)") {
    val wav = Multimodal.encodeWavPcm16(Array[Short](100, 100, 100, 100), 1, 8000)
    val media = Seq((0L, "audio", 0, 0, wav))
      .toDF("doc_id", "media_type", "width", "height", "content")
    val f = Multimodal.extractFeatures(spark, media).head()
    assert(f.features(7) == 1.0f, "wav payload must take the real path")
    assert(f.features.take(6).toSeq == Seq(8000f, 1f, 16f, 4f, 100f, 100f))
  }

  test("probeMp4Meta: junk and truncation rejected; fixture parses") {
    assert(Multimodal.probeMp4Meta("nonsense bytes".getBytes).isEmpty)
    assert(Multimodal.probeMp4Meta(Array[Byte](0, 0, 0, 8)).isEmpty)
    val fixture = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/repo/src/test/resources/fixtures/video/v_isom_640.mp4"))
    val m = Multimodal.probeMp4Meta(fixture).get
    assert(m.brand == "isom" && m.timescale == 1000L && m.duration == 5000L)
    assert(m.nTracks == 1 && m.width == 640 && m.height == 360)
    // truncated mid-moov: the sibling-box walker must stop cleanly
    assert(Multimodal.probeMp4Meta(fixture.take(fixture.length / 2)) match {
      case None => true
      case Some(p) => p.brand == "isom" // partial parse is fine, no throw
    })
  }

  test("splitJpegFrames is marker-aware, not a naive FFD9 scan") {
    val f1 = Multimodal.encodeJpegGray(16, 8, 100)
    val f2 = Multimodal.encodeJpegGray(16, 8, 200)
    // plant a COM segment whose PAYLOAD contains the EOI byte pair
    // FF D9 right after SOI — a naive byte scan would split there; the
    // segment walk must skip it by declared length
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0x00, 0x04,
      0xff.toByte, 0xd9.toByte)
    val poisoned = f1.take(2) ++ com ++ f1.drop(2)
    val stream = poisoned ++ f2
    val ranges = Multimodal.splitJpegFrames(stream, 0, stream.length)
    assert(ranges.size == 2)
    assert(ranges(0) == (0, poisoned.length))
    assert(ranges(1) == (poisoned.length, stream.length))
    // and the poisoned frame still really decodes
    val s = Multimodal.decodeImageStats(poisoned).get
    assert(s.width == 16 && s.height == 8 && s.sumR == 16L * 8 * 100)
  }

  test("decodeVideoFrames: synthesized MJPEG round-trips exactly") {
    val docs = Seq(3L, 17L).toDF("doc_id")
    val rows = Multimodal.videoFramesById(
      spark, Multimodal.synthesizeVideos(spark, docs)).collect()
    for (id <- Seq(3L, 17L)) {
      val w = ((id % 10) * 4 + 12).toInt
      val h = ((id % 7) * 4 + 12).toInt
      val nF = (id % 5 + 2).toInt
      val mine = rows.filter(_.doc_id == id).sortBy(_.frame_no)
      assert(mine.length == nF)
      mine.zipWithIndex.foreach { case (r, i) =>
        assert(r.frame_no == i && r.width == w && r.height == h)
        val v = (id * 37 + i * 11) % 256
        assert(r.sum_r == w.toLong * h * v && r.sum_g == r.sum_r)
      }
    }
  }

  test("decodeVideoFrames: largesize and to-EOF mdat encodings") {
    val dir = "/root/repo/src/test/resources/fixtures/video_frames"
    def frames(name: String) = Multimodal.decodeVideoFrames(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/$name")))
    val large = frames("v_largesize_mdat.mp4")
    assert(large.map(_._1) == Seq(0, 1))
    assert(large.head._2.sumR == 24L * 24 * 250)
    val eof = frames("v_eof_mdat.mp4")
    assert(eof.map(_._1) == Seq(0, 1))
    assert(eof.head._2.width == 40 && eof.head._2.sumR == 40L * 8 * 123)
    assert(Multimodal.decodeVideoFrames("junk bytes".getBytes).isEmpty)
  }

  test("decodeVideoFrames: AVI movi chunks, plain and rec-grouped") {
    val dir = "/root/repo/src/test/resources/fixtures/video_frames"
    def frames(name: String) = Multimodal.decodeVideoFrames(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/$name")))
    val basic = frames("a_basic.avi")
    assert(basic.map(_._1) == Seq(0, 1, 2))
    assert(basic.map(_._2.sumR) == Seq(32L * 24 * 50, 32L * 24 * 150, 32L * 24 * 250))
    // rec-grouped chunks with interleaved odd-size audio chunks: the
    // walker must skip 01wb and stay aligned across RIFF pad bytes
    // (odd 13x11 JPEGs make every frame chunk odd-length)
    val rec = frames("a_rec_audio.avi")
    assert(rec.map(_._1) == Seq(0, 1, 2))
    assert(rec.map(_._2.sumR) == Seq(13L * 11 * 33, 13L * 11 * 77, 13L * 11 * 222))
    rec.foreach(f => assert(f._2.width == 13 && f._2.height == 11))
  }

  test("probeAviMeta: avih fields recovered; junk and BMFF rejected") {
    val dir = "/root/repo/src/test/resources/fixtures/video"
    def bytesOf(name: String) =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/$name"))
    val m = Multimodal.probeAviMeta(bytesOf("a_cam_30fps.avi")).get
    assert(m.brand == "AVI " && m.timescale == 33333 && m.duration == 900)
    assert(m.nTracks == 2 && m.width == 640 && m.height == 480)
    assert(Multimodal.probeAviMeta("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.probeAviMeta(bytesOf("v_tiny.mp4")).isEmpty)
    // the combined router picks the right dialect per payload
    assert(Multimodal.probeVideoMeta(bytesOf("v_tiny.mp4")).get.brand == "isom")
    assert(Multimodal.probeVideoMeta(bytesOf("a_odd_junk.avi")).get.timescale == 40000)
  }

  test("sampleVideoFrames: every step-th frame re-emitted as a real JPEG") {
    val media = Multimodal.synthesizeVideos(spark, Seq(4L).toDF("doc_id"))
    // doc 4: 6 frames of 28x28 — step 2 keeps frames 0, 2, 4
    val sampled = Multimodal.sampleVideoFrames(spark, media, step = 2).collect()
    assert(sampled.map(_.getAs[Int]("frame_no")).sorted.toSeq == Seq(0, 2, 4))
    sampled.foreach { r =>
      val s = Multimodal.decodeImageStats(r.getAs[Array[Byte]]("content")).get
      val v = (4L * 37 + r.getAs[Int]("frame_no") * 11) % 256
      assert(s.width == 28 && s.height == 28 && s.sumR == 28L * 28 * v)
    }
  }

  test("extractFeatures: real frame decode on video rows (mjpeg payload)") {
    val stream = Multimodal.encodeJpegGray(12, 12, 50) ++
      Multimodal.encodeJpegGray(12, 12, 150)
    val media = Seq((0L, "video", 12, 12, stream))
      .toDF("doc_id", "media_type", "width", "height", "content")
    val f = Multimodal.extractFeatures(spark, media).head()
    assert(f.features(7) == 1.0f, "mjpeg payload must take the real path")
    assert(f.features.take(3).toSeq == Seq(12f, 12f, 2f))
    assert(math.abs(f.features(3) - 100f) < 0.5f)  // mean luma of 50/150
  }

  test("feature vector is a normalized byte histogram (sums to ~1)") {
    val f = Multimodal
      .extractFeatures(spark, Multimodal.synthesizeMedia(docs.filter($"doc_id" === 0L)))
      .head()
    assert(math.abs(f.features.sum - 1.0f) < 1e-5)
  }
}
