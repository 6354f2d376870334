package graft

import org.apache.spark.sql.functions._
import graft.functions.DeflateLength
import graft.text.TextOps

class CompressionSpec extends SparkSpec {
  import spark.implicits._

  /** Direct JDK Deflater model — the expression must match it byte for
    * byte (same zlib, same level, same nowrap framing). */
  private def model(s: String, level: Int): Int = {
    val d = new java.util.zip.Deflater(level, true)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](1 << 16)
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    d.end(); n
  }

  private val samples = Seq(
    "",
    "a",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "the quick brown fox jumps over the lazy dog",
    ("lorem ipsum dolor sit amet " * 40).trim,
    (0 until 200).map(i => (i * 2654435761L % 997).toString).mkString(" "))

  test("matches the direct Deflater model exactly, several levels") {
    for (level <- Seq(1, 6, 9)) {
      val got = samples.toDF("t")
        .select(DeflateLength(col("t"), level).as("n"))
        .collect().map(_.getInt(0)).toSeq
      val want = samples.map(s => model(s, level))
      assert(got == want, s"level=$level got=$got want=$want")
    }
  }

  test("repetition compresses far below mixed text; null propagates") {
    val df = Seq(
      (1L, "boilerplate line\n" * 50),
      (2L, (0 until 100).map(i => (i * 48271 % 9973).toString)
        .mkString(" ")),
      (3L, null.asInstanceOf[String])).toDF("id", "t")
    val r = df.select(col("id"),
        TextOps.compressionRatio(col("t")).as("r"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(r(3L) == null)
    val (rep, mixed) = (r(1L).asInstanceOf[Double], r(2L).asInstanceOf[Double])
    assert(rep < mixed / 3, s"rep=$rep mixed=$mixed")
    assert(rep > 0.0 && mixed <= 1.5)
  }

  test("thread-local reuse stays correct across many rows and levels") {
    val n = 2000
    val df = (1 to n).map(i => s"row $i " * (i % 17 + 1)).toDF("t")
      .repartition(8)
    val sums = df.select(
        DeflateLength(col("t"), 1).as("a"),
        DeflateLength(col("t"), 9).as("b"))
      .agg(sum("a"), sum("b")).head()
    // level 9 never beats level 1 by being LARGER in aggregate
    assert(sums.getLong(1) <= sums.getLong(0))
    // spot-check a deterministic re-run
    val again = df.select(DeflateLength(col("t"), 9).as("b"))
      .agg(sum("b")).head().getLong(0)
    assert(again == sums.getLong(1))
  }
}
