package graft

import org.apache.spark.sql.functions._
import graft.text.{LangModel, Pack}

/** Differential tests for the sequence-layout (packConcat / chunk) and
  * unigram-LM-scoring operators against plain-Scala models. */
class PackLmSpec extends SparkSpec {
  import spark.implicits._

  test("curriculumBuckets: equal-frequency bins, monotone in difficulty") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = graft.text.LangModel
      .curriculumBuckets(docs, "doc_id", "text", buckets = 10)
      .select("diff_fx", "bucket").as[(Long, Long)].collect()
    graft.core.Intermediates.release()
    val n = out.length
    assert(n > 0)
    // bins are equal-frequency to within one rank-rounding unit
    val sizes = out.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.keySet == (0L until 10L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1, sizes.toMap.toString)
    // bucket is monotone in difficulty: max diff of bucket b <= min of b+1
    val byB = out.groupBy(_._2).view
      .mapValues(v => (v.map(_._1).min, v.map(_._1).max)).toMap
    (0L until 9L).foreach { b =>
      assert(byB(b)._2 <= byB(b + 1)._1, s"bucket $b overlaps ${b + 1}")
    }
  }

  private def tokens(t: String): Seq[String] =
    t.split("\\s+").filter(_.nonEmpty).toSeq

  // ---- packConcat --------------------------------------------------------

  test("packConcat matches a sequential prefix-sum model on real documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val got = Pack.packConcat(docs, "doc_id",
        graft.text.TextOps.tokenCount(col("text")), seqLen = 128)
      .select("doc_id", "n_tok", "tok_start", "seq_first", "seq_last")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    val model = docs.as[(Long, String)].collect().sortBy(_._1)
      .foldLeft((0L, Vector.empty[(Long, Long, Long, Long, Long)])) {
        case ((off, acc), (id, text)) =>
          val n = tokens(text).size.toLong
          val row = (id, n, off, off / 128, (off + math.max(n, 1) - 1) / 128)
          (off + n, acc :+ row)
      }._2
    assert(got.toSeq == model)
  }

  test("packConcat is exact across many partitions and a forced range shuffle") {
    // ids deliberately unsorted in the input; counts prime-ish so
    // sequence boundaries land mid-document
    val rows = (0 until 1000).map(i => (i.toLong, ("w " * (i % 37 + 1)).trim))
    val df = spark.createDataFrame(rows.reverse).toDF("doc_id", "text")
      .repartition(7)
    val got = Pack.packConcat(df, "doc_id",
        graft.text.TextOps.tokenCount(col("text")), seqLen = 64)
      .select("doc_id", "tok_start").as[(Long, Long)].collect().toMap
    var off = 0L
    rows.foreach { case (id, text) =>
      assert(got(id) == off, s"doc $id")
      off += tokens(text).size
    }
  }

  test("packConcat: zero-token doc occupies no tokens but reports its sequence") {
    val df = Seq((1L, "a b c"), (2L, ""), (3L, "d")).toDF("doc_id", "text")
    val got = Pack.packConcat(df, "doc_id",
        graft.text.TextOps.tokenCount(col("text")), seqLen = 2)
      .select("doc_id", "n_tok", "tok_start", "seq_first", "seq_last")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, 0L, 0L, 1L), // tokens 0..2 → seqs 0..1
      (2L, 0L, 3L, 1L, 1L), // empty: starts at token 3, spans nothing
      (3L, 1L, 3L, 1L, 1L)))
  }

  test("packConcat rejects clashing output columns and bad seqLen") {
    val df = Seq((1L, 2L)).toDF("doc_id", "tok_start")
    intercept[IllegalArgumentException] {
      Pack.packConcat(df, "doc_id", lit(1L), seqLen = 8)
    }
    intercept[IllegalArgumentException] {
      Pack.packConcat(Seq((1L, "x")).toDF("doc_id", "text"), "doc_id",
        lit(1L), seqLen = 0)
    }
  }

  // ---- chunk -------------------------------------------------------------

  test("chunk emits sliding windows with a short tail and drops empty docs") {
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"), // 7 tokens
      (2L, ""),                     // no chunks
      (3L, "solo")
    ).toDF("doc_id", "text")
    val got = Pack.chunk(df, "doc_id", "text", width = 4, stride = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 1L, "t6"),
      (3L, 0L, 1L, "solo")))
  }

  test("chunk covers every token and respects width on real documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(100)
    val chunks = Pack.chunk(docs, "doc_id", "text", width = 16, stride = 8)
      .as[(Long, Long, Long, String)].collect()
    val nTok = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> tokens(t).size }.toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = nTok(id)
      // one chunk per stride-start strictly inside the doc
      assert(cs.length == (n + 7) / 8, s"doc $id")
      cs.foreach { case (_, idx, ct, text) =>
        val expectLen = math.min(16, n - idx * 8)
        assert(ct == expectLen && tokens(text).size == expectLen.toInt,
          s"doc $id chunk $idx")
      }
    }
  }

  // ---- LangModel ---------------------------------------------------------

  private def fxLog2(num: Long, den: Long): Long = {
    // independent model: exact arithmetic on BigDecimal-free doubles is
    // what the operator promises; here recompute from scratch
    val e0 = (63 - java.lang.Long.numberOfLeadingZeros(num)) -
      (63 - java.lang.Long.numberOfLeadingZeros(den))
    val y0 = num.toDouble / (den << e0).toDouble
    var (y, e) = if (y0 < 1.0) (y0 * 2.0, e0 - 1) else (y0, e0)
    var bits = 0L
    for (_ <- 1 to 16) {
      val y2 = y * y
      if (y2 >= 2.0) { bits = bits * 2 + 1; y = y2 / 2.0 }
      else { bits = bits * 2; y = y2 }
    }
    e.toLong * 65536 + bits
  }

  test("ratioLog2Fx is exact fixed-point log2 across a wide input sweep") {
    val cases = for {
      den <- Seq(1L, 2L, 3L, 7L, 100L, 9999L)
      num <- Seq(den, den + 1, den * 2, den * 3 + 1, den * 1000 + 17)
    } yield (num, den)
    val got = cases.toDF("num", "den")
      .select(LangModel.ratioLog2Fx(col("num"), col("den")).as("fx"))
      .as[Long].collect()
    cases.zip(got).foreach { case ((num, den), fx) =>
      assert(fx == fxLog2(num, den), s"log2($num/$den)")
      // sanity vs float log2: fx truncates toward -inf at 2^-16
      val f = math.log(num.toDouble / den) / math.log(2.0)
      assert(math.abs(fx / 65536.0 - f) < 3e-5, s"log2($num/$den) value")
    }
  }

  test("scoreNllFx matches a plain-Scala unigram model on real documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val rows = docs.as[(Long, String)].collect()
    val toks = rows.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val voc = toks.flatMap(_._2).groupBy(identity).map { case (t, g) =>
      t -> g.size.toLong }
    val n = voc.values.sum
    val v = voc.size.toLong
    val surp = voc.map { case (t, c) => t -> fxLog2(n + v, c + 1) }
    val expected = toks.filter(_._2.nonEmpty).map { case (id, ts) =>
      (id, ts.size.toLong, ts.map(surp).sum)
    }.toSet
    val got = LangModel.scoreNllFx(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("scoreNll float scores agree with fx scores within quantization") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    val fx = LangModel.scoreNllFx(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val fl = LangModel.scoreNll(docs, "doc_id", "text")
      .select("doc_id", "n_tok", "nll_nats", "bits_per_token")
      .as[(Long, Long, Double, Double)].collect()
    fl.foreach { case (id, n, nats, bpt) =>
      val (nFx, nll) = fx(id)
      assert(n == nFx)
      val bitsFx = nll.toDouble / 65536.0
      val bitsFloat = nats / math.log(2.0)
      // fx truncates each token's surprisal at 2^-16 bits: the summed
      // error is < n / 65536 bits plus float-sum noise
      assert(math.abs(bitsFx - bitsFloat) <= n / 65536.0 + 1e-6, s"doc $id")
      assert(math.abs(bpt - bitsFloat / n) < 1e-9, s"doc $id bpt")
      assert(bpt > 0 && bpt < 64)
    }
  }

  test("rarer tokens raise scoreNllFx: surprisal is monotone in rarity") {
    val docs = (Seq.fill(50)("common common common") ++ Seq("rarex common"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val perTok = LangModel.scoreNllFx(docs, "doc_id", "text")
      .withColumn("avg", col("nll_fx").cast("double") / col("n_tok"))
      .select("doc_id", "avg").as[(Long, Double)].collect().toMap
    assert(perTok(50L) > perTok(0L))
  }

  test("scoreBigramFx matches a plain-Scala Stupid Backoff model, and backoff fires") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val rows = docs.as[(Long, String)].collect()
    val toksById = rows.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val allToks = toksById.flatMap(_._2)
    val uni = allToks.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val n = uni.values.sum
    val v = uni.size.toLong
    val bigrams = toksById.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
    val bm = bigrams.groupBy(identity).collect {
      case (p, g) if g.size >= 2 => p -> g.size.toLong }
    // the pruning must leave both branches reachable on this corpus
    assert(bm.nonEmpty, "no retained bigrams — corpus too small")
    assert(bigrams.distinct.exists(p => !bm.contains(p)),
      "no pruned bigrams — backoff branch untested")
    val expected = toksById.filter(_._2.nonEmpty).map { case (id, ts) =>
      val first = fxLog2(n + v, uni(ts.head) + 1)
      val trans = ts.zip(ts.drop(1)).map { p =>
        bm.get(p) match {
          case Some(c12) => fxLog2(uni(p._1), c12)
          case None      => fxLog2(5L * (n + v), 2L * (uni(p._2) + 1))
        }
      }.sum
      (id, ts.size.toLong, first + trans)
    }.toSet
    val got = graft.text.LangModel.scoreBigramFx(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("scoreBigramFx: repeated text scores far below rare-token soup per token") {
    val docs = ((0 until 30).map(i => (i.toLong, "the cat sat on the mat")) ++
      Seq((100L, "zq xv wk jy qp"))).toDF("doc_id", "text")
    val avg = graft.text.LangModel.scoreBigramFx(docs, "doc_id", "text")
      .withColumn("a", col("nll_fx").cast("double") / col("n_tok"))
      .select("doc_id", "a").as[(Long, Double)].collect().toMap
    assert(avg(100L) > 2 * avg(0L))
  }

  // ---- deterministic shuffle --------------------------------------------

  test("seeded md5 shuffle is a deterministic permutation, not identity") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"))
    def key = md5(concat(coalesce(col("doc_id").cast("string"),
      lit("\u001E")), lit("|graft-shuffle-42")).cast("binary"))
    val order = graft.core.Pipe(docs)
      .zipWithIndex(Seq(key), "shuffle_pos")
      .df.select("doc_id", "shuffle_pos").as[(Long, Long)].collect()
    val n = order.length
    assert(order.map(_._2).sorted.toSeq == (0L until n).toSeq) // permutation
    assert(order.sortBy(_._2).map(_._1).toSeq !=
      order.map(_._1).sorted.toSeq) // not id-order
    val again = graft.core.Pipe(docs)
      .zipWithIndex(Seq(md5(concat_ws("|", col("doc_id").cast("string"),
        lit("graft-shuffle-42")).cast("binary"))), "shuffle_pos")
      .df.select("doc_id", "shuffle_pos").as[(Long, Long)].collect()
    assert(order.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq) // stable
  }
}
