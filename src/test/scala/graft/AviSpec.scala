package graft

import graft.multimodal.{Avi, Multimodal}

/** REAL MJPEG-AVI video decode: the RIFF container walk, the Mjpeg
  * decoder, the Auto router, and real-frame sampling — all against
  * in-memory AVIs built around true JPEG frames (exact-value pixel
  * assertions, no binary fixtures). */
class AviSpec extends SparkSpec {

  /** Encode a solid-color JPEG in memory. */
  private def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    out.toByteArray
  }

  test("build → parse round-trip: header fields and every frame span") {
    val frames = Seq(jpegBytes(24, 16, 0xff0000), jpegBytes(24, 16, 0x00ff00),
      jpegBytes(24, 16, 0x0000ff))
    val avi = Avi.build(frames, width = 24, height = 16,
      microSecPerFrame = 40000L)
    assert(Avi.isAvi(avi))
    val (header, spans) = Avi.parse(avi)
    assert(header.contains(Avi.Header(40000L, 3L, 24, 16)))
    assert(spans.size == 3)
    // each span is the EXACT jpeg payload
    spans.zip(frames).foreach { case (s, f) =>
      assert(java.util.Arrays.equals(Avi.frameBytes(avi, s), f))
    }
    // every frame decodes to the true dimensions via plain ImageIO
    spans.foreach { s =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Avi.frameBytes(avi, s)))
      assert(img.getWidth == 24 && img.getHeight == 16)
    }
  }

  test("Mjpeg decoder: header dims + first-frame features + frame count") {
    val avi = Avi.build(Seq(jpegBytes(32, 8, 0xffffff),
      jpegBytes(32, 8, 0x000000)), width = 32, height = 8)
    val (w, h, feats) = Multimodal.Decoder.Mjpeg.decode(avi)
    assert(w == 32 && h == 8)
    assert(feats(7) == 2f) // frame count rides the spare slot
    // first frame is white: channel means ~1.0, std ~0
    assert(feats(0) > 0.95f && feats(3) > 0.95f && feats(4) < 0.05f,
      feats.mkString(","))
    // all but the count slot equal the plain image decode of frame 0
    val (_, spans) = Avi.parse(avi)
    val (_, _, imgFeats) =
      Multimodal.Decoder.Image.decode(Avi.frameBytes(avi, spans.head))
    assert(feats.take(7).sameElements(imgFeats.take(7)))
  }

  test("Auto routes AVI to Mjpeg; corrupt AVIs fall back to Fake") {
    val avi = Avi.build(Seq(jpegBytes(16, 16, 0x804020)), 16, 16)
    val direct = Multimodal.Decoder.Mjpeg.decode(avi)
    val routed = Multimodal.Decoder.Auto.decode(avi)
    assert(routed._1 == direct._1 && routed._2 == direct._2 &&
      routed._3.sameElements(direct._3))
    // an AVI header with garbage where frames should be → Fake, no throw
    val corrupt = avi.take(40) ++ Array.fill(30)(0x5a.toByte)
    val fb = Multimodal.Decoder.Auto.decode(corrupt)
    val fake = Multimodal.Decoder.Fake.decode(corrupt)
    assert(fb._3.sameElements(fake._3))
    // truncation mid-frame parses the intact prefix without throwing
    val truncated = avi.dropRight(avi.length / 3)
    val (_, spans) = Avi.parse(truncated)
    assert(spans.size <= 1) // never reports a span past the cut
  }

  test("corrupt 1µs-per-frame header cannot wrap the stride negative: " +
      "frame 0 still emits") {
    import spark.implicits._
    val avi = Avi.build(Seq(jpegBytes(8, 8, 0x123456)), 8, 8,
      microSecPerFrame = 1L)
    val assets = spark.createDataset(Seq(
      Multimodal.Asset(1L, "video", avi, "avi", 0, 0, 100L)))
    val got = Multimodal.sampleFrames(assets, everyMs = 3_000_000_000L)
      .select("frameIdx").as[Int].collect()
    assert(got.toSeq == Seq(0))
  }

  test("sampleFrames on a real MJPEG AVI samples true container frames " +
      "at the header rate") {
    import spark.implicits._
    // 10 fps (100ms per frame), 6 frames; everyMs=200 → stride 2 → 0,2,4
    val frames = (0 until 6).map(i => jpegBytes(20, 10, i * 0x111111))
    val avi = Avi.build(frames, 20, 10, microSecPerFrame = 100000L)
    val assets = spark.createDataset(Seq(
      Multimodal.Asset(7L, "video", avi, "avi", 0, 0, 600L),
      // non-AVI payload keeps the deterministic synthetic path
      Multimodal.Asset(8L, "video", Array[Byte](1, 2, 3), "raw", 0, 0, 2000L)))
    val got = Multimodal.sampleFrames(assets, everyMs = 200L,
        decoder = Multimodal.Decoder.Auto)
      .select("id", "frameIdx", "width", "height").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val real = got.filter(_._1 == 7L).sortBy(_._2)
    assert(real.map(_._2).toSeq == Seq(0, 2, 4), real.mkString(","))
    assert(real.forall(r => r._3 == 20 && r._4 == 10))
    // synthetic path still emits duration-derived slots (2000/200 = 10)
    assert(got.count(_._1 == 8L) == 10)
  }
}
