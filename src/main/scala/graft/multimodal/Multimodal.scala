package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 row 68): image/audio/video as
  * opaque `binary` columns with typed metadata.
  *
  * Scale rules enforced by this module's shapes:
  *  - binary payloads NEVER enter a shuffle: all wide ops (joins, groupBys)
  *    run on (id, metadata) projections; payload columns re-attach by id
  *    only after the wide op ("late fetch");
  *  - decode/feature-extract runs per-partition in batches via
  *    `mapPartitions` over a typed Dataset — the Scala analog of a
  *    batched `mapInPandas` — so per-record codec setup amortizes;
  *  - image, audio AND MJPEG-video codecs are REAL (pure-JDK:
  *    `javax.imageio` for PNG/JPEG/GIF/BMP, `javax.sound.sampled` for PCM
  *    WAV, [[Avi]] + imageio for MJPEG AVI — see [[Decoder.Image]]/
  *    [[Decoder.Wav]]/[[Decoder.Mjpeg]]/[[Decoder.Auto]]); only
  *    inter-frame codecs (H.264/VP9 — no JVM decoder exists) remain a
  *    documented deterministic stand-in ([[Decoder.Fake]]).
  */
object Multimodal {

  /** ImageIO's default stream cache backs EVERY encode/decode with a
    * temp FILE — a silent per-payload disk round-trip that dominates
    * batched in-memory codec work (measured ~10× on the planted-AVI
    * dedup row). Referencing this lazy val flips the JVM to the memory
    * cache once; every codec path below touches it before ImageIO. */
  lazy val fastImageIO: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** One multimodal asset: payload + typed metadata. */
  case class Asset(id: Long, modality: String, payload: Array[Byte],
                   format: String, width: Int, height: Int,
                   durationMs: Long)

  case class DecodedFrame(id: Long, frameIdx: Int, width: Int, height: Int,
                          features: Array[Float])

  val assetSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("durationMs", LongType, nullable = false)))

  /** Pluggable batched decoder, initialized once per partition.
    *
    * REAL codecs ship for images, audio and MJPEG video — the JDK itself
    * carries them: [[Decoder.Image]] decodes PNG/JPEG/GIF/BMP via
    * `javax.imageio`, [[Decoder.Wav]] decodes PCM WAV via
    * `javax.sound.sampled`, and [[Decoder.Mjpeg]] decodes MJPEG AVI via
    * the [[Avi]] RIFF walk + imageio per frame. Only inter-frame codecs
    * (H.264/VP9) remain a documented stand-in ([[Decoder.Fake]] — no JVM
    * decoder exists). [[Decoder.Auto]] sniffs the container magic and
    * routes. */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float])
  }

  object Decoder {
    /** Deterministic fake for modalities with no JVM codec (video):
      * "decodes" dims + a feature vector from a rolling hash of the
      * payload — stable across runs/partitionings, so specs can assert
      * exact values. */
    object Fake extends Decoder {
      def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
        var h = 1125899906842597L
        var i = 0
        while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
        val w = 16 + math.floorMod(h, 16).toInt * 16
        val ht = 16 + math.floorMod(h >> 8, 16).toInt * 16
        val feats = Array.tabulate(8) { j =>
          val hj = h * (j + 1) + 0x9e3779b97f4a7c15L
          (math.floorMod(hj, 1000L).toFloat / 1000f) - 0.5f
        }
        (w, ht, feats)
      }
    }

    /** REAL image decode (javax.imageio — PNG/JPEG/GIF/BMP): returns the
      * true pixel dimensions and an 8-dim feature vector
      * [meanR, meanG, meanB, meanLuma, stdLuma, aspect, log10(area), 0]
      * computed over the full raster (channel means in 0..1). */
    object Image extends Decoder {
      def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
        Multimodal.fastImageIO
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) sys.error("ImageIO: unreadable image payload")
        val w = img.getWidth; val h = img.getHeight
        var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            val l = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sl += l; sl2 += l * l
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        val meanL = sl / n
        val varL = math.max(0.0, sl2 / n - meanL * meanL)
        (w, h, Array(
          (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat,
          (sb / n / 255.0).toFloat, (meanL / 255.0).toFloat,
          (math.sqrt(varL) / 255.0).toFloat,
          (w.toDouble / h).toFloat, math.log10(n).toFloat, 0f))
      }

      /** REAL resize (Graphics2D bilinear): returns re-encoded PNG bytes. */
      def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
        Multimodal.fastImageIO
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (src == null) sys.error("ImageIO: unreadable image payload")
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        if (!javax.imageio.ImageIO.write(dst, "png", out))
          sys.error("ImageIO: no PNG writer")
        out.toByteArray
      }
    }

    /** REAL audio decode (javax.sound.sampled — PCM WAV): returns
      * (sampleRateHz, channels) in the two int slots and an 8-dim feature
      * vector [durationSec, rms, peak, zeroCrossRate, channels,
      * sampleRate/1e3, 0, 0] over normalized samples in -1..1. */
    object Wav extends Decoder {
      def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          // ULAW/ALAW WAVs are valid RIFF with 8/16-bit samples — decoding
          // the companded bytes as linear PCM would yield plausible-but-
          // garbage features; fail here so Auto's fallback-to-Fake fires
          val enc = fmt.getEncoding
          if (enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              enc != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
            sys.error(s"WAV: unsupported encoding $enc (PCM only)")
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val frames = in.getFrameLength
          val data = in.readAllBytes()
          val n = data.length / bytesPerSample
          var i = 0; var s2 = 0.0; var peak = 0.0; var zc = 0; var prev = 0.0
          while (i < n) {
            val off = i * bytesPerSample
            val raw: Double = (fmt.getSampleSizeInBits, fmt.isBigEndian) match {
              case (16, false) =>
                ((data(off + 1) << 8) | (data(off) & 0xff)).toShort / 32768.0
              case (16, true) =>
                ((data(off) << 8) | (data(off + 1) & 0xff)).toShort / 32768.0
              case (8, _) => ((data(off) & 0xff) - 128) / 128.0
              case (bits, _) => sys.error(s"WAV: unsupported sample size $bits")
            }
            s2 += raw * raw; if (math.abs(raw) > peak) peak = math.abs(raw)
            if (i > 0 && (raw >= 0) != (prev >= 0)) zc += 1
            prev = raw
            i += 1
          }
          val durSec = frames.toDouble / fmt.getFrameRate
          (fmt.getSampleRate.toInt, fmt.getChannels, Array(
            durSec.toFloat, math.sqrt(s2 / math.max(1, n)).toFloat,
            peak.toFloat, (zc.toDouble / math.max(1, n)).toFloat,
            fmt.getChannels.toFloat, (fmt.getSampleRate / 1e3).toFloat, 0f, 0f))
        } finally in.close()
      }
    }

    /** REAL video decode for MJPEG AVI (see [[Avi]] — pure-JVM RIFF walk,
      * every frame a standalone JPEG for `javax.imageio`): returns the
      * container dimensions (header, falling back to the first frame's
      * true pixel dims) and the FIRST frame's image features with the
      * frame count in the last slot:
      * [meanR, meanG, meanB, meanLuma, stdLuma, aspect, log10(area),
      * frameCount]. Non-AVI or frameless payloads raise — [[Auto]] then
      * falls back to [[Fake]], keeping the one-bad-payload contract. */
    object Mjpeg extends Decoder {
      def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
        val (header, frames) = Avi.parse(payload)
        if (frames.isEmpty) sys.error("AVI: no video frame chunks")
        val (fw, fh, feats) = Image.decode(Avi.frameBytes(payload, frames.head))
        val w = header.map(_.width).filter(_ > 0).getOrElse(fw)
        val h = header.map(_.height).filter(_ > 0).getOrElse(fh)
        (w, h, feats.updated(7, frames.size.toFloat))
      }
    }

    /** Magic-byte sniffing router: PNG/JPEG/GIF/BMP → [[Image]], RIFF-WAVE
      * → [[Wav]], RIFF-AVI → [[Mjpeg]], anything else (non-MJPEG video,
      * unknown) → [[Fake]]. A sniff hit whose codec then fails (the
      * 2-byte 'BM' prefix false-positives on ordinary text; non-PCM WAV
      * variants; H.264-in-AVI) also falls back to [[Fake]] — "unknown →
      * Fake" is the contract, and one bad payload must not kill a
      * distributed decode job. */
    object Auto extends Decoder {
      def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
        def at(i: Int): Int = if (i < payload.length) payload(i) & 0xff else -1
        val isImage =
          (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') ||
          (at(0) == 0xff && at(1) == 0xd8) || // JPEG SOI
          (at(0) == 'G' && at(1) == 'I' && at(2) == 'F') ||
          (at(0) == 'B' && at(1) == 'M')
        val isWav = at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
          at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E'
        try {
          if (isImage) Image.decode(payload)
          else if (isWav) Wav.decode(payload)
          else if (Avi.isAvi(payload)) Mjpeg.decode(payload)
          else Fake.decode(payload)
        } catch {
          case scala.util.control.NonFatal(_) => Fake.decode(payload)
        }
      }
    }
  }

  /** Build a deterministic multimodal table from the documents table
    * (payload = utf-8 text bytes) — the test stand-in for a real binary
    * source like parquet-with-binary or a blob-store manifest. */
  def syntheticAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val bytes = Option(text).getOrElse("").getBytes("UTF-8")
        val mod = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        Asset(id, mod, bytes, if (mod == "image") "png" else "raw",
          width = 0, height = 0, durationMs = bytes.length.toLong * 10)
    }
  }

  /** Deterministic REAL MJPEG AVI per id: video `i` carries
    * `1 + i % 5` solid-color JPEG frames at `(16 + (i%3)·8) ×
    * (8 + (i%2)·8)` pixels, 40 ms/frame (25 fps) in the avih header.
    * Every layout fact is pure id arithmetic, so a DuckDB oracle can
    * replay the CONTAINER-STRUCTURAL outputs of a decode pipeline
    * (frame indices, true decoded dimensions) without a SQL JPEG codec —
    * the pixel-content features stay spec-asserted (AviSpec) instead.
    * Encoding runs per-partition; payloads never shuffle. */
  def plantedMjpegAssets(ids: Dataset[java.lang.Long]): Dataset[Asset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.filter(_ != null).map(_.longValue()).mapPartitions { it =>
      it.map { id =>
        val w = 16 + (id % 3).toInt * 8
        val h = 8 + (id % 2).toInt * 8
        val n = 1 + (id % 5).toInt
        val frames = (0 until n).map { fi =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = img.createGraphics()
          try {
            g.setColor(new java.awt.Color(
              ((id * 37 + fi * 11) % 256).toInt, 0, 0))
            g.fillRect(0, 0, w, h)
          } finally g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          if (!javax.imageio.ImageIO.write(img, "jpg", out))
            sys.error("ImageIO: no JPEG writer")
          out.toByteArray
        }
        Asset(id, "video", Avi.build(frames, w, h, microSecPerFrame = 40000L),
          "avi", w, h, durationMs = n * 40L)
      }
    }
  }

  /** Batched decode: per-partition iterator so decoder init happens once
    * per task, not per row (the mapInPandas batching contract). */
  def decodeFeatures(assets: Dataset[Asset],
                     decoder: Decoder = Decoder.Fake): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      // per-partition init of the (possibly expensive) codec happens here
      it.map { a =>
        val (w, h, f) = decoder.decode(a.payload)
        DecodedFrame(a.id, 0, w, h, f)
      }
    }.toDF()
  }

  /** Frame sampling for video assets: every `everyMs` ms of duration emits
    * one frame row (deterministic), exploded without touching payload in
    * the shuffle. */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long = 1000L,
                   decoder: Decoder = Decoder.Fake): DataFrame = {
    require(everyMs > 0, s"sampleFrames needs everyMs > 0 (got $everyMs)")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.modality == "video").mapPartitions { it =>
      it.flatMap { a =>
        val aviFrames =
          if (Avi.isAvi(a.payload)) Avi.parse(a.payload) else (None, Vector.empty)
        if (aviFrames._2.nonEmpty) {
          // REAL container path (MJPEG AVI): sample actual frame chunks
          // at the header frame rate; frameIdx is the true container
          // frame index. A frame that fails to decode (non-MJPEG codec
          // inside an AVI) degrades to the deterministic fake on ITS
          // bytes rather than killing the task.
          val (header, spans) = aviFrames
          val periodUs = header.map(_.microSecPerFrame)
            .filter(_ > 0).getOrElse(33333L)
          // clamp BEFORE the Int cast (same rule as sampleSynthetic): a
          // corrupt 1µs-per-frame header with a large everyMs would wrap
          // the stride negative and silently emit zero frames
          val stride = math.min(Int.MaxValue.toLong, math.max(1L,
            (everyMs * 1000L + periodUs / 2) / periodUs)).toInt
          (0 until spans.size by stride).iterator.map { fi =>
            val bytes = Avi.frameBytes(a.payload, spans(fi))
            val (w, h, f) =
              try Decoder.Image.decode(bytes)
              catch { case scala.util.control.NonFatal(_) =>
                Decoder.Fake.decode(bytes) }
            DecodedFrame(a.id, fi, w, h, f)
          }
        } else sampleSynthetic(a, everyMs, decoder)
      }
    }.toDF()
  }

  /** The non-container sampling path: deterministic per-(asset, index)
    * decode over duration-derived frame slots. */
  private def sampleSynthetic(a: Asset, everyMs: Long,
      decoder: Decoder): Iterator[DecodedFrame] = {
        // clamp BEFORE the Int cast: a corrupt/huge durationMs would wrap
        // .toInt negative and silently emit ZERO frames for the asset
        // (the contract is at least one)
        val n = math.min(Int.MaxValue.toLong,
          math.max(1L, a.durationMs / everyMs)).toInt
        // ONE per-asset payload copy: appending the frame index to the
        // payload per frame would churn n × |payload| transient bytes
        // (a 1 MB payload at n=10000 frames = ~10 GB of allocations)
        val base = a.payload
        val buf = java.util.Arrays.copyOf(base, base.length + 8)
        (0 until n).iterator.map { fi =>
          var v = fi.toLong; var i = 0
          while (i < 8) { buf(base.length + i) = (v & 0xff).toByte
            v >>= 8; i += 1 }
          val (w, h, f) = decoder.decode(buf)
          DecodedFrame(a.id, fi, w, h, f)
        }
  }

  /** REAL distributed image resize: payloads re-encoded per-partition
    * (Graphics2D bilinear → PNG), never shuffled — the narrow map stays in
    * the same stage as the scan. Non-image payloads pass through. */
  def resizeImages(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.modality == "image")
          a.copy(payload = Decoder.Image.resize(a.payload, w, h),
            format = "png", width = w, height = h)
        else a
      }
    }
  }

  /** Late-fetch join pattern: run the wide op on metadata only, then
    * re-attach payloads by id — keeps multi-MB binaries out of the
    * exchange. */
  def lateFetch(meta: DataFrame, assets: DataFrame, idCol: String = "id"): DataFrame =
    meta.join(assets.select(col(idCol), col("payload")), Seq(idCol), "left")
}
