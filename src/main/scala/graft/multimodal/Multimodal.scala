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
  *  - the actual codec is STUBBED (no image/audio libs in this
  *    environment): [[Decoder.Fake]] derives deterministic pseudo-decoded
  *    metadata/features from the payload bytes. The Spark-side plumbing —
  *    schema, encoders, batching, partitioning — is real and tested.
  */
object Multimodal {

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

  /** Pluggable batched decoder. A real implementation wraps a JNI/FFI codec
    * initialized once per partition; `Fake` is the deterministic stand-in. */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float])
  }

  object Decoder {
    /** Deterministic fake: "decodes" dims + a feature vector from a rolling
      * hash of the payload — stable across runs/partitionings, so specs can
      * assert exact values. Swap for a real codec in production. */
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
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.modality == "video").mapPartitions { it =>
      it.flatMap { a =>
        val n = math.max(1L, a.durationMs / everyMs).toInt
        (0 until n).iterator.map { fi =>
          val (w, h, f) = decoder.decode(a.payload ++ BigInt(fi).toByteArray)
          DecodedFrame(a.id, fi, w, h, f)
        }
      }
    }.toDF()
  }

  /** Resize = metadata transform only (real resize happens at decode in the
    * batched path; the plan-level contract is that payload bytes pass
    * through untouched and un-shuffled). */
  def resizeMeta(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("width", lit(w)).withColumn("height", lit(h))

  /** Late-fetch join pattern: run the wide op on metadata only, then
    * re-attach payloads by id — keeps multi-MB binaries out of the
    * exchange. */
  def lateFetch(meta: DataFrame, assets: DataFrame, idCol: String = "id"): DataFrame =
    meta.join(assets.select(col(idCol), col("payload")), Seq(idCol), "left")
}
