package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Audio fingerprinting + near-duplicate audio dedup — the audio member
  * of the perceptual-dedup family ([[ImageHash]] is the image member).
  *
  * The fingerprint is an ENERGY-ENVELOPE dHash: decode PCM, split the
  * first 65·`BlockSamples` samples into 65 equal blocks, take each
  * block's integer Σ|sample|, and emit one bit per adjacent block pair
  * (right > left) — 64 bits. Comparisons of integer sums make the hash
  * exactly replayable in SQL (no float-order hazards) and VOLUME
  * INVARIANT: scaling every sample by a positive factor scales all block
  * sums together, flipping no comparison — re-levelled copies of a clip
  * collide at Hamming 0 (the property spec pins it at ×3 gain).
  *
  * Scale shape: hashing is a per-partition map (payloads never shuffle —
  * the [[Multimodal]] contract); pair-finding reuses the pigeonhole-
  * banded Hamming join, so only 8-byte hashes reach an exchange.
  * Decode is REAL (`javax.sound.sampled`, PCM WAV, 16-bit LE).
  */
object AudioHash {

  /** Samples per envelope block; 65 blocks ⇒ 64 comparison bits. */
  val BlockSamples = 32
  val Blocks = 65
  /** Minimum decodable length for a full-rank hash. */
  val MinSamples: Int = BlockSamples * Blocks

  /** 64-bit envelope hash over the first [[MinSamples]] samples. */
  def envelopeHash(payload: Array[Byte]): Long = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      require(fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"envelopeHash supports 16-bit LE signed PCM (got $fmt)")
      val data = in.readAllBytes()
      val n = data.length / 2
      require(n >= MinSamples,
        s"envelopeHash needs >= $MinSamples samples (got $n)")
      val sums = new Array[Long](Blocks)
      var i = 0
      while (i < MinSamples) {
        val s = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
        sums(i / BlockSamples) += math.abs(s.toLong)
        i += 1
      }
      var hash = 0L
      var k = 0
      while (k < 64) {
        if (sums(k + 1) > sums(k)) hash |= 1L << k
        k += 1
      }
      hash
    } finally in.close()
  }

  /** (id, ehash) for every audio asset — per-partition decode. */
  def hashAssets(assets: Dataset[Multimodal.Asset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.modality == "audio")
      .mapPartitions(it => it.map(a => (a.id, envelopeHash(a.payload))))
      .toDF("id", "ehash")
  }

  /** Near-duplicate audio pairs within `maxDist` Hamming bits — the same
    * lossless pigeonhole-banded join as the SimHash/ImageHash paths.
    * Hashes persist before the self-join (decode runs once, not twice —
    * the [[ImageHash.nearDupPairs]] rationale). */
  def nearDupPairs(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    val cached = graft.core.Intermediates.track(
      hashes.select(col("id"), col("ehash").as("simhash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    graft.dedup.Dedup.simhashPairs(cached, maxDist)
  }

  /** Deterministic REAL 16-bit PCM mono WAV per id (8 kHz, exactly
    * [[MinSamples]] samples) — every sample is pure id arithmetic, so a
    * DuckDB oracle replays decode→envelope→hash exactly. Base sample
    * `t`: `s = (b·31 + (1+b%23)·t²·7 + (1+b%19)·t·13) % 2048 − 1024`
    * (the per-doc quadratic coefficient keeps organic Hamming-≤3
    * collisions down to ~28 per 2000 clips; a doc-independent t² term
    * produced ~3.4k — a pair-output artifact at scale). Ids ≥ 1e6
    * are planted twins of id−1e6: the SAME signal at DOUBLE volume
    * (hash-invariant) with ONE sample bumped by +500 — at most the two
    * envelope bits adjacent to that sample's block move, Hamming ≤ 2. */
  def plantedWavAssets(ids: Dataset[java.lang.Long]): Dataset[Multimodal.Asset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.filter(_ != null).map(_.longValue()).mapPartitions { it =>
      it.map { id =>
        val b = id % 1000000L
        val twin = id >= 1000000L
        val t0 = ((b % Blocks) * BlockSamples + b % BlockSamples).toInt
        val pcm = new Array[Byte](MinSamples * 2)
        var t = 0
        while (t < MinSamples) {
          val base = (b * 31 + (1 + b % 23) * t.toLong * t * 7 +
            (1 + b % 19) * t * 13) % 2048 - 1024
          val s = (if (twin) 2 * base + (if (t == t0) 500L else 0L)
                   else base).toInt
          pcm(2 * t) = (s & 0xff).toByte
          pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
          t += 1
        }
        Multimodal.Asset(id, "audio", wavBytes(pcm, sampleRateHz = 8000),
          "wav", 0, 0, durationMs = MinSamples * 1000L / 8000L)
      }
    }
  }

  /** Canonical 44-byte RIFF/WAVE header + PCM payload (16-bit LE mono) —
    * written by hand so the planted bytes are deterministic; decoded by
    * the REAL `javax.sound.sampled` codec on the read side. */
  def wavBytes(pcm: Array[Byte], sampleRateHz: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRateHz)
      .putInt(sampleRateHz * 2)          // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    out.array()
  }
}
