package graft

import graft.multimodal.{AudioHash, Multimodal}

/** Audio envelope fingerprinting (SURVEY.md §2 row 68c): volume
  * invariance, the arithmetic oracle contract, twin recall through the
  * banded join, and codec strictness. */
class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  private def wavOf(samples: Array[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    AudioHash.wavBytes(pcm, 8000)
  }

  test("envelope hash is invariant under exact positive gain (x3)") {
    val base = Array.tabulate(AudioHash.MinSamples)(t =>
      (t * t * 11 + t * 5) % 1800 - 900)
    val hashed = AudioHash.envelopeHash(wavOf(base))
    assert(hashed == AudioHash.envelopeHash(wavOf(base.map(_ * 3))),
      "scaling every sample x3 must not flip a single envelope bit")
    assert(hashed != AudioHash.envelopeHash(wavOf(base.map(-_).reverse)),
      "a genuinely different signal must hash differently")
  }

  test("hash at planted shape is pure sample arithmetic (oracle contract)") {
    val b = 4242L
    val asset = AudioHash.plantedWavAssets(
      Seq(java.lang.Long.valueOf(b)).toDS()).head()
    val sums = new Array[Long](AudioHash.Blocks)
    (0 until AudioHash.MinSamples).foreach { t =>
      val s = (b * 31 + (1 + b % 23) * t.toLong * t * 7 +
        (1 + b % 19) * t * 13) % 2048 - 1024
      sums(t / AudioHash.BlockSamples) += math.abs(s)
    }
    var expected = 0L
    (0 until 64).foreach(k =>
      if (sums(k + 1) > sums(k)) expected |= 1L << k)
    assert(AudioHash.envelopeHash(asset.payload) == expected)
  }

  test("double-volume twins land within Hamming 2; banded join finds them") {
    val ids = ((0L until 40L) ++ (1000000L until 1000040L))
      .map(java.lang.Long.valueOf).toDS()
    val hashes = AudioHash.hashAssets(AudioHash.plantedWavAssets(ids))
    val hs = hashes.as[(Long, Long)].collect().toMap
    (0L until 40L).foreach { b =>
      val d = java.lang.Long.bitCount(hs(b) ^ hs(b + 1000000L))
      assert(d <= 2, s"twin of $b at Hamming $d")
    }
    val got = AudioHash.nearDupPairs(hashes, maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val all = hs.toSeq.sortBy(_._1)
    val expected = (for {
      (a, ha) <- all; (c, hc) <- all if a < c
      if java.lang.Long.bitCount(ha ^ hc) <= 3
    } yield (a, c)).toSet
    assert(got == expected)
    (0L until 40L).foreach(b => assert(got.contains((b, b + 1000000L))))
  }

  test("too-short and non-PCM payloads raise instead of mis-hashing") {
    val short = wavOf(Array.fill(100)(5))
    intercept[IllegalArgumentException] {
      AudioHash.envelopeHash(short)
    }
    val mixed = Seq(
      Multimodal.Asset(1L, "image", Array[Byte](1, 2), "png", 0, 0, 0L),
      AudioHash.plantedWavAssets(
        Seq(java.lang.Long.valueOf(3L)).toDS()).head()).toDS()
    val out = AudioHash.hashAssets(mixed).as[(Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(3L))
  }
}
