package graft

import org.apache.spark.sql.functions._
import graft.dedup.Cdc
import graft.functions.GearHash

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(s: String, min: Int = 16, bits: Int = 6,
                       max: Int = 256): Seq[String] =
    Seq(s).toDF("t")
      .select(Cdc.chunks(col("t"), min, bits, max).as("c"))
      .head().getSeq[String](0)

  private def randText(n: Int, seed: Long): String = {
    val r = new scala.util.Random(seed)
    val words = Seq("alpha", "beta", "gamma", "delta", "scan", "join",
      "hash", "merge", "row", "key")
    (0 until n).map(_ => words(r.nextInt(words.length))).mkString(" ")
  }

  test("chunks reassemble losslessly and respect size bounds") {
    val s = randText(400, 1L)
    val cs = chunksOf(s)
    assert(cs.mkString("") == s)
    // every chunk except the last obeys [min, max]; the tail may be short
    cs.dropRight(1).foreach { c =>
      assert(c.length >= 16 && c.length <= 256, s"len=${c.length}")
    }
    assert(cs.last.length <= 256)
    assert(cs.length > 3, s"expected several chunks, got ${cs.length}")
  }

  test("boundaries are deterministic") {
    val s = randText(300, 2L)
    assert(chunksOf(s) == chunksOf(s))
  }

  test("an insertion at the head shifts only a prefix of the chunks") {
    // the CDC property fixed-size blocks lack: boundaries re-synchronize
    // after the edit because they depend on local content only
    val s = randText(3000, 3L)
    val base = chunksOf(s)
    val edited = chunksOf("INSERTED-PREFIX " + s)
    val common = base.toSet.intersect(edited.toSet).size
    assert(common >= (base.size * 0.8).toInt,
      s"only $common of ${base.size} chunks survived a head insertion")
  }

  test("surrogate pairs are never split; empty input is total") {
    val astral = "𝒜𝒷" * 200
    val cs = chunksOf(astral, min = 4, bits = 3, max = 17)
    assert(cs.mkString("") == astral)
    cs.foreach { c =>
      assert(!Character.isHighSurrogate(c.last),
        "chunk ends with an unpaired high surrogate")
      assert(!Character.isLowSurrogate(c.head),
        "chunk starts with an unpaired low surrogate")
    }
    assert(chunksOf("") == Seq(""))
  }

  test("binary mode chunks and reassembles byte-exactly") {
    val r = new scala.util.Random(7L)
    val bytes = Array.fill(2000)(r.nextInt(256).toByte)
    val back = Seq(Tuple1(bytes)).toDF("b")
      .select(Cdc.chunks(col("b"), 16, 5, 128).as("c"))
      .select(size(col("c")).as("n"),
        expr("aggregate(c, X'', (acc, e) -> concat(acc, e))").as("rt"))
      .head()
    assert(back.getAs[Array[Byte]]("rt").toSeq == bytes.toSeq)
    assert(back.getInt(0) > 5)
  }

  test("gear boundaries differ when content differs (content-defined)") {
    // pure unit test on the boundary function: two different tails after
    // a shared prefix must not force identical suffix boundaries
    val a = "x" * 100 + randText(500, 11L)
    val b = "x" * 100 + randText(500, 12L)
    val ba = GearHash.boundaries(a.length, a.charAt(_).toInt, 8, 5, 64,
      _ => false).toSeq
    val bb = GearHash.boundaries(b.length, b.charAt(_).toInt, 8, 5, 64,
      _ => false).toSeq
    assert(ba != bb)
    // shared prefix boundaries agree up to the divergence point
    val cut = ba.takeWhile(_ <= 100)
    assert(bb.take(cut.length) == cut)
  }

  test("dedupStats sees cross-document chunk sharing") {
    val shared = randText(600, 21L)
    val docs = Seq(
      (1L, shared + " unique-tail-one " + randText(50, 22L)),
      (2L, shared + " unique-tail-two " + randText(50, 23L)),
      (3L, randText(300, 24L))).toDF("doc_id", "text")
    val row = Cdc.dedupStats(docs, col("doc_id"), col("text"),
      minSize = 16, maskBits = 5, maxSize = 128).head()
    val logical = row.getAs[Long]("logical_units")
    val physical = row.getAs[Long]("physical_units")
    assert(physical < logical,
      s"expected chunk sharing: physical=$physical logical=$logical")
    // the two near-identical docs share their prefix region ⇒ savings
    // should be a sizable fraction of one shared-prefix copy
    assert(logical - physical > shared.length / 2)
  }

  test("dialect CDC_CHUNKS routes to the chunker") {
    val df = Seq((1L, randText(200, 31L))).toDF("id", "t")
    val out = graft.piglatin.PigScript.run(spark,
      "b = FOREACH a GENERATE id, CDC_CHUNKS(t, 16, 5, 128) AS c;",
      tables = Map("a" -> df)).relation("b")
    val cs = out.head().getSeq[String](1)
    assert(cs.mkString("") == df.head().getString(1))
    assert(cs.length > 1)
  }
}
