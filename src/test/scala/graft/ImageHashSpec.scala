package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{ImageHash, Multimodal}

/** Perceptual image hashing (SURVEY.md §2 row 68b): the dHash core's
  * invariances, the real codec round-trip, and the banded near-dup join. */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  /** Gray test raster from a deterministic pixel function. */
  private def gray(w: Int, h: Int)(f: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("dHash is invariant under exact 2x upscale (resize robustness)") {
    def f(x: Int, y: Int) = (x * 37 + y * 91 + 13) % 256
    val base = gray(9, 8)(f)
    val up = gray(18, 16)((x, y) => f(x / 2, y / 2))
    assert(ImageHash.dHash(base) == ImageHash.dHash(up),
      "2x block upscale must not change a single dHash bit")
  }

  test("dHash is invariant under lossless re-encode (BMP vs PNG)") {
    val img = gray(27, 24)((x, y) => (x * 53 + y * 29) % 256)
    def enc(fmt: String) = {
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out))
      out.toByteArray
    }
    assert(ImageHash.dHashBytes(enc("bmp")) == ImageHash.dHashBytes(enc("png")))
  }

  test("dHash at grid size is pure pixel arithmetic (the oracle contract)") {
    // replicate plantedBmpAssets' pixel rule for one id and check the
    // decoded-BMP hash against a direct bit computation
    val b = 4242L
    val asset = ImageHash.plantedBmpAssets(
      Seq(java.lang.Long.valueOf(b)).toDS()).head()
    def v(x: Int, y: Int) =
      ((b * 7 + (1 + b % 13) * x * 29 + (1 + b % 11) * y * 53 +
        (b * b % 251) * x * y + (b % 17) * 11 * x * x) % 256).toInt
    var expected = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (v(x + 1, y) > v(x, y)) expected |= 1L << (y * 8 + x)
    assert(ImageHash.dHashBytes(asset.payload) == expected)
  }

  test("planted twins sit within Hamming 2; nearDupPairs finds exactly them") {
    val ids = ((0L until 40L) ++ (1000000L until 1000040L))
      .map(java.lang.Long.valueOf).toDS()
    val hashes = ImageHash.hashAssets(ImageHash.plantedBmpAssets(ids))
    val hs = hashes.as[(Long, Long)].collect().toMap
    (0L until 40L).foreach { b =>
      val d = java.lang.Long.bitCount(hs(b) ^ hs(b + 1000000L))
      assert(d <= 2, s"twin of $b at Hamming $d")
    }
    val got = ImageHash.nearDupPairs(hashes, maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute-force truth over the 80 hashes
    val all = hs.toSeq.sortBy(_._1)
    val expected = (for {
      (a, ha) <- all; (b2, hb) <- all if a < b2
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b2)).toSet
    assert(got == expected)
    (0L until 40L).foreach(b => assert(got.contains((b, b + 1000000L))))
  }

  test("hashAssets skips non-image modalities instead of crashing on them") {
    val mixed = Seq(
      Multimodal.Asset(1L, "audio", Array[Byte](1, 2, 3), "raw", 0, 0, 0L),
      ImageHash.plantedBmpAssets(
        Seq(java.lang.Long.valueOf(7L)).toDS()).head()).toDS()
    val out = ImageHash.hashAssets(mixed).as[(Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(7L))
  }
}
