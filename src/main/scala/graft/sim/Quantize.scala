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
  def int8(vec: Column): Column =
    // (vmin, vscale) are BOUND as a lambda variable before the
    // per-element pass: higher-order functions evaluate interpreted, so
    // referencing array_min/array_max expressions inside the element
    // lambda would rescan the array per element — O(d²) per row (the
    // same re-evaluation class as the winnow fix; 1.53 s → 0.31 s on the
    // quantize query). Op order is unchanged, so values stay bit-equal.
    element_at(transform(
      array(struct(array_min(vec).as("mn"),
        ((array_max(vec) - array_min(vec)) / 255.0).as("sc"))),
      s => {
        val vmin = s.getField("mn")
        val vscale = s.getField("sc")
        struct(vmin.as("vmin"), vscale.as("vscale"),
          transform(vec, x =>
            when(vscale === 0.0, lit(-128).cast(ByteType))
              .otherwise((least(floor((x - vmin) / vscale), lit(255L)) - 128)
                .cast(ByteType))).as("codes"))
      }), 1)

  /** Unsigned quantization level (0..255) of a stored signed-byte code. */
  def level(code: Column): Column = code.cast(IntegerType) + 128

  /** Midpoint dequantization: vmin + (level + 0.5)·vscale —
    * reconstruction error ≤ vscale/2 per component (≤ range/510). */
  def dequantInt8(q: Column): Column =
    transform(q.getField("codes"), c =>
      q.getField("vmin") +
        (level(c).cast(DoubleType) + 0.5) * q.getField("vscale"))
}
