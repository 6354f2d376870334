package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Video near-duplicate dedup — the video member of the perceptual-dedup
  * family ([[ImageHash]] images, [[AudioHash]] audio): two videos are
  * near-duplicates when they share at least `minShared` distinct
  * per-frame perceptual hashes (re-cut / re-muxed copies of the same
  * footage share most frames; unrelated videos share none).
  *
  * Per-frame fingerprints are [[ImageHash.dHash]] over REAL decode
  * (the [[Avi]] RIFF walk + imageio JPEG per frame — the same pipeline
  * `q_video_frames` oracles structurally). Pair-finding is an inverted-
  * index equi-join on the 8-byte frame hash — payloads never shuffle,
  * nothing is all-pairs, and a doc-frequency cap on hash buckets bounds
  * the fan-out of degenerate hashes (the ngramJaccard discipline).
  *
  * JPEG is lossy, so decoded pixels are deterministic-but-not-SQL-
  * replayable; the oracle therefore checks the PAIR SET structurally:
  * planted twins share all but one frame byte-identically (identical
  * JPEG bytes ⇒ identical decode ⇒ identical hash on every shared
  * frame), the per-id gradient family keeps organic cross-video hash
  * collisions empirically at zero, and hash VALUES are pinned by spec
  * (determinism + twin-overlap counts) rather than by SQL.
  */
object VideoHash {

  /** Per-frame perceptual hashes: (id, frameIdx, fhash) — per-partition
    * decode of every container frame, payloads never shuffle. Frames
    * that fail to decode are skipped (one bad frame must not kill a
    * distributed job; the planted corpora decode fully). */
  def frameHashes(assets: Dataset[Multimodal.Asset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(a => a.modality == "video" && Avi.isAvi(a.payload))
      .mapPartitions { it =>
        Multimodal.fastImageIO
        it.flatMap { a =>
          val (_, spans) = Avi.parse(a.payload)
          spans.zipWithIndex.iterator.flatMap { case (span, fi) =>
            try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(Avi.frameBytes(a.payload, span)))
              if (img == null) None
              else Some((a.id, fi, ImageHash.dHash(img)))
            } catch { case scala.util.control.NonFatal(_) => None }
          }
        }
      }.toDF("id", "frameIdx", "fhash")
  }

  /** Video pairs sharing ≥ `minShared` DISTINCT frame hashes. The
    * inverted index drops hashes occurring in more than `maxHashFreq`
    * videos (a solid-color intro card shared by thousands of videos
    * would otherwise fan out quadratically — same recall caveat as the
    * ngramJaccard doc-frequency cap: pairs whose EVERY shared hash is
    * ubiquitous are missed; raise the cap on such corpora). */
  def nearDupPairs(frames: DataFrame, minShared: Int = 2,
                   maxHashFreq: Int = 64): DataFrame = {
    // persist the 16-byte (id, fhash) index: its upstream is the frame
    // DECODE, and the freq-cap join + self-join would otherwise re-run
    // it four times (the ImageHash/AudioHash.nearDupPairs rationale)
    val inv = graft.core.Intermediates.track(
      frames.select(col("id"), col("fhash")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val capped = inv.join(
      inv.groupBy("fhash").agg(count(lit(1)).as("__df"))
        .where(col("__df") <= maxHashFreq)
        .select(col("fhash")),
      Seq("fhash"))
    capped.as("l").join(capped.as("r"), Seq("fhash"))
      .where(col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(countDistinct(col("fhash")).as("shared_frames"))
      .where(col("shared_frames") >= minShared)
  }

  /** Deterministic gradient MJPEG AVIs: video `b` carries `1 + b%5`
    * frames at 36×32, frame `fi`'s pixels drawn from the same enriched
    * per-id gradient family as the planted BMPs (plus frame terms, so a
    * video's own frames get distinct hashes). Ids ≥ 1e6 are twins of
    * id−1e6: the SAME frames byte for byte, except frame 0 is replaced
    * with another id's content — twins share exactly n−1 frame hashes.
    * The JPEG encoder is deterministic (same raster ⇒ same bytes), so
    * shared frames hash identically without the oracle ever modeling
    * JPEG loss. */
  def plantedGradientAvis(ids: Dataset[java.lang.Long]): Dataset[Multimodal.Asset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.filter(_ != null).map(_.longValue()).mapPartitions { it =>
      Multimodal.fastImageIO
      it.map { id =>
        val b = id % 1000000L
        val twin = id >= 1000000L
        val n = 1 + (b % 5).toInt
        val frames = (0 until n).map { fi =>
          // twin swaps frame 0's CONTENT key; all other frames share the
          // base id's content and therefore its exact JPEG bytes
          val ck = if (twin && fi == 0) b + 500000L else b
          encodeFrame(ck, fi)
        }
        Multimodal.Asset(id, "video",
          Avi.build(frames, 36, 32, microSecPerFrame = 40000L),
          "avi", 36, 32, durationMs = n * 40L)
      }
    }
  }

  /** One 36×32 gradient JPEG for content key `ck`, frame `fi`. */
  private def encodeFrame(ck: Long, fi: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 36) {
        val v = ((ck * 7 + (1 + ck % 13) * x * 29 + (1 + ck % 11) * y * 53 +
          (ck * ck % 251) * x * y + (ck % 17) * 11 * x * x +
          fi * 97L + (1 + ck % 7) * fi * x * 19) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "jpg", out))
      sys.error("ImageIO: no JPEG writer")
    out.toByteArray
  }
}
