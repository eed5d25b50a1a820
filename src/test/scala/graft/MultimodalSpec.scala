package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{AudioCodec, ImageCodec, MediaFixture, Multimodal}

/** Real image decode (q43/q44): PNG is lossless, so
  * decode(encodePng(formula)) must reproduce the formula pixel-exactly
  * — these tests pin that end-to-end, plus the image/byte-domain
  * dispatch in the shared extractors.
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("PNG encode→decode round-trips the pixel formula exactly") {
    Seq(0, 7, 55, 95).foreach { id =>
      val d = ImageCodec.decode(MediaFixture.png(id)).get
      assert(d.width == MediaFixture.width(id))
      assert(d.height == MediaFixture.height(id))
      for (y <- 0 until d.height; x <- 0 until d.width)
        assert(d.rgb(y * d.width + x) == MediaFixture.rgb(id, x, y),
          s"pixel mismatch id=$id ($x,$y)")
    }
  }

  test("nearest-neighbor resample picks floor-scaled source pixels") {
    val d = ImageCodec.decode(MediaFixture.png(3)).get
    val out = ImageCodec.resampleNearest(d, 4, 4)
    for (j <- 0 until 4; i <- 0 until 4) {
      val x = i * d.width / 4
      val y = j * d.height / 4
      assert(out(j * 4 + i) == d.rgb(y * d.width + x))
    }
  }

  test("extractMeta dispatches: real dimensions for images, byte fallback otherwise") {
    import spark.implicits._
    val png = MediaFixture.png(11)
    val txt = "just some text".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, txt)).toDF("id", "payload")
    val got = Multimodal.extractMeta(df, "id", "payload").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    assert(got(1L) == (MediaFixture.width(11), MediaFixture.height(11)))
    assert(got(2L) == (txt.length % 640, txt.length % 480))
  }

  test("image features are exact channel statistics") {
    val d = ImageCodec.decode(MediaFixture.png(20)).get
    val f = Multimodal.imageFeatures(d, 8)
    val (sr, sg, sb) = ImageCodec.channelSums(d)
    val n = d.rgb.length.toDouble
    assert(f(0) == sr / n / 255.0)
    assert(f(1) == sg / n / 255.0)
    assert(f(2) == sb / n / 255.0)
    assert(f(3) == d.width.toDouble / (d.width + d.height))
    f.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("q43/q44 decode every fixture image") {
    val meta = SparkEntry.queries("q43_image_meta")(spark, sf).collect()
    assert(meta.length == MediaFixture.nImages)
    meta.foreach { r =>
      val id = r.getAs[Long]("img_id").toInt
      assert(r.getAs[Int]("width") == MediaFixture.width(id))
      assert(r.getAs[Int]("height") == MediaFixture.height(id))
    }
    val rs = SparkEntry.queries("q44_image_resize")(spark, sf).collect()
    assert(rs.length == MediaFixture.nImages)
    rs.foreach(r => assert(r.getAs[String]("rgb_hex").length == 16 * 6))
  }

  test("q57 dhash: monotone gradient saturates, constant image zeroes") {
    import spark.implicits._
    // 9x8 source images so the resample is the identity: a strictly
    // x-increasing luma sets every adjacent-column gradient bit, a
    // constant image sets none — the two boundary fingerprints.
    val grad = ImageCodec.encodePng(9, 8, (x, _) => {
      val v = x * 20; (v << 16) | (v << 8) | v })
    val flat = ImageCodec.encodePng(9, 8, (_, _) => 0x505050)
    val rows = Multimodal.imageDhash(
        Seq((0L, grad), (1L, flat)).toDF("img_id", "png"), "img_id", "png")
      .orderBy("img_id").collect()
    assert(rows(0).getAs[String]("dhash_hex") == "f" * 16)
    assert(rows(1).getAs[String]("dhash_hex") == "0" * 16)
    // and the fixture sweep emits one 16-hex fingerprint per image
    val all = SparkEntry.queries("q57_image_dhash")(spark, sf).collect()
    assert(all.length == MediaFixture.nImages)
    all.foreach(r =>
      assert(r.getAs[String]("dhash_hex").matches("[0-9a-f]{16}")))
  }

  test("WAV codec: exact round-trip, chunk walk, loud on corruption") {
    val samples = Array.tabulate(100)(i => (i * 37 - 1850).toShort)
    val wav = AudioCodec.encodeWav(8000, samples)
    val d = AudioCodec.decodeWav(wav).get
    assert(d.sampleRate == 8000 && d.samples.sameElements(samples))
    // an inserted unknown chunk before fmt/data must be skipped, not
    // tripped over (the chunk WALK is what makes the parse genuine)
    val extra = java.nio.ByteBuffer.allocate(wav.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(wav, 0, 12) // RIFF + size + WAVE
      .put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0)
      .put(wav, 12, wav.length - 12)
    val d2 = AudioCodec.decodeWav(extra.array()).get
    assert(d2.samples.sameElements(samples))
    // an ODD-length unknown chunk carries a RIFF pad byte; the walk
    // must skip it or every later chunk id shifts by one
    val odd = java.nio.ByteBuffer.allocate(wav.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    odd.put(wav, 0, 12)
      .put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0)) // 3 data bytes + 1 pad
      .put(wav, 12, wav.length - 12)
    val d3 = AudioCodec.decodeWav(odd.array()).get
    assert(d3.samples.sameElements(samples))
    // corruption classes all refuse instead of misreading
    assert(AudioCodec.decodeWav(wav.take(30)).isEmpty, "truncated")
    val badMagic = wav.clone(); badMagic(0) = 'X'.toByte
    assert(AudioCodec.decodeWav(badMagic).isEmpty, "bad magic")
    val stereo = wav.clone(); stereo(22) = 2 // channels field
    assert(AudioCodec.decodeWav(stereo).isEmpty, "non-mono refused")
    // and the fixture sweep decodes every clip with exact stats
    val rows = SparkEntry.queries("q58_audio_meta")(spark, sf).collect()
    assert(rows.length == MediaFixture.nClips)
    rows.foreach { r =>
      val id = r.getAs[Long]("clip_id").toInt
      assert(r.getAs[Long]("n_samples") == MediaFixture.clipSamples(id).toLong)
      assert(r.getAs[Int]("peak") <= 4096)
    }
  }

  test("GVID container: sampled slices round-trip, corruption refused") {
    import graft.functions.VideoContainer
    val frames = (0 until 7).map(i => Array.fill(10 + i)(i.toByte))
    val v = VideoContainer.encode(frames)
    assert(VideoContainer.frameCount(v).contains(7))
    val sampled = VideoContainer.sampleFrames(v, Seq(0, 3, 6)).get
    assert(sampled.zip(Seq(0, 3, 6)).forall { case (f, i) =>
      f.sameElements(frames(i)) })
    assert(VideoContainer.sampleFrames(v, Seq(7)).isEmpty, "out of range")
    assert(VideoContainer.frameCount(v.take(6)).isEmpty, "truncated header")
    val bad = v.clone(); bad(0) = 'X'.toByte
    assert(VideoContainer.frameCount(bad).isEmpty, "bad magic")
    assert(VideoContainer.sampleFrames(v.take(30), Seq(0, 3)).isEmpty,
      "truncated payload")
    // fixture sweep: every 3rd frame of every video, exact dims
    val rows = SparkEntry.queries("q59_video_frames")(spark, sf).collect()
    val expRows = (0 until MediaFixture.nVideos)
      .map(id => (MediaFixture.videoFrames(id) + 2) / 3).sum
    assert(rows.length == expRows)
    rows.foreach { r =>
      val id = r.getAs[Long]("video_id").toInt
      assert(r.getAs[Int]("frame_idx") % 3 == 0)
      assert(r.getAs[Int]("width") == MediaFixture.width(id))
      assert(r.getAs[Int]("height") == MediaFixture.height(id))
    }
  }
}
