package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar quantization for embedding columns — the storage/bandwidth lever
  * for vector corpora at scale (a 64-dim float vector is 256 bytes; its
  * int8 codes are 64 bytes + two doubles). Per-vector min/max scaling to
  * [0, 255]; everything is a narrow per-row Column composition (no
  * shuffle, stays in whole-stage codegen), and the arithmetic is plain
  * IEEE doubles in a fixed op order so an oracle replays it bit-for-bit.
  */
object Quantize {

  /** Quantize `vec` (array<double>) to struct(vmin, vscale, codes):
    * unsigned level floor((x_i − vmin)/vscale) clamped to 255 with
    * vscale = (vmax − vmin)/255, STORED as a signed byte (level − 128) —
    * array<tinyint>, 1 byte/component in Tungsten rows and shuffles, the
    * actual 4×-over-float storage win (an int array would be 4
    * bytes/component). Constant vectors (vscale 0) store level 0. */
  def int8(vec: Column): Column = {
    val vmin = array_min(vec)
    val vscale = (array_max(vec) - vmin) / 255.0
    val codes = transform(vec, x =>
      when(vscale === 0.0, lit(-128).cast(ByteType))
        .otherwise((least(floor((x - vmin) / vscale), lit(255L)) - 128)
          .cast(ByteType)))
    struct(vmin.as("vmin"), vscale.as("vscale"), codes.as("codes"))
  }

  /** Unsigned quantization level (0..255) of a stored signed-byte code. */
  def level(code: Column): Column = code.cast(IntegerType) + 128

  /** Midpoint dequantization: vmin + (level + 0.5)·vscale —
    * reconstruction error ≤ vscale/2 per component (≤ range/510). */
  def dequantInt8(q: Column): Column =
    transform(q.getField("codes"), c =>
      q.getField("vmin") +
        (level(c).cast(DoubleType) + 0.5) * q.getField("vscale"))
}
