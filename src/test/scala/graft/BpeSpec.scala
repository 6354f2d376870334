package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe

/** Learned-BPE tokenizer: training properties, the engine encode vs an
  * independent single-merge model (the equivalence the oracle relies
  * on), and unicode safety. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox and the lazy dog and the end"),
    (2L, "the fox and the dog and the fox again"),
    (3L, "quick quick quick brown brown the the the")
  ).toDF("doc_id", "text")

  private lazy val merges = Bpe.train(corpus, "text", numMerges = 40,
    sampleSize = 512)

  /** Clean-room encode: iterated LEFTMOST SINGLE merge of the
    * lowest-rank pair — deliberately the other algorithm than the
    * engine's all-occurrences pass, so equality proves the equivalence
    * the DuckDB oracle's recursion also relies on. */
  private def modelEncode(word: String): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.codePoints().toArray.toSeq
      .map(cp => new String(Character.toChars(cp))) :+ "</w>"
    var done = false
    while (!done && syms.length > 1) {
      val cands = syms.zip(syms.tail).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
      if (cands.isEmpty) done = true
      else {
        val (_, i) = cands.min
        syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
      }
    }
    syms
  }

  test("training is deterministic and bounded by numMerges") {
    val again = Bpe.train(corpus, "text", numMerges = 40, sampleSize = 512)
    assert(merges == again)
    assert(merges.length <= 40 && merges.nonEmpty)
  }

  test("the dominant word collapses to a single token") {
    // 'the' appears 9 times — 40 merges easily learn t+h, th+e, the+</w>
    val toks = spark.range(1).select(
        Bpe.encode(lit("the"), merges).as("t"))
      .collect().head.getSeq[String](0)
    assert(toks == Seq("the</w>"), toks.toString)
  }

  test("engine encode equals the single-merge model on every corpus word " +
      "and on random strings") {
    val words = corpus.select(explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "").distinct().as[String].collect().toSeq
    val rnd = new scala.util.Random(11L)
    val randoms = Seq.fill(40)(
      (1 to (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(5)).toChar)
        .mkString)
    val all = words ++ randoms
    val got = all.toDF("w")
      .select(col("w"), Bpe.encode(col("w"), merges).as("t"))
      .as[(String, Seq[String])].collect().toMap
    all.foreach { w =>
      assert(got(w) == modelEncode(w), s"word '$w'")
    }
  }

  test("tokens concatenate back to the word plus terminal marker") {
    val words = Seq("quick", "unseen", "zzz")
    words.foreach { w =>
      val toks = spark.range(1)
        .select(Bpe.encode(lit(w), merges).as("t"))
        .collect().head.getSeq[String](0)
      assert(toks.mkString == w + "</w>", s"word '$w': $toks")
    }
  }

  test("decode inverts encode to the whitespace-normalized text, " +
      "including hostile spacing and multi-line input") {
    val texts = Seq("quick brown fox", "  leading and   runs\t of\nmix ",
      "single", "", "   ", "a𝔘b c")
    val rows = texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
    val got = rows.select(col("id"),
        Bpe.decode(Bpe.encode(col("text"), merges)).as("rt"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = t.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(got(i) == want, s"text '$t'")
    }
  }

  test("astral-plane codepoints stay whole symbols") {
    val w = "a𝔘b" // a 𝔘 b
    val toks = spark.range(1)
      .select(Bpe.encode(lit(w), Seq.empty).as("t"))
      .collect().head.getSeq[String](0)
    assert(toks == Seq("a", "𝔘", "b", "</w>"), toks.toString)
  }

  test("encodeIds maps tokens to stable ids; OOV symbols hit <unk>=0") {
    val v = Bpe.vocab(corpus, "text", merges, sampleSize = 512)
    assert(!v.contains("<unk>") && v.values.forall(_ >= 1))
    val out = Seq((1L, "the fox"), (2L, "Ω"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        Bpe.encodeIds(col("text"), merges, v).as("ids"),
        Bpe.encode(col("text"), merges).as("toks"))
      .as[(Long, Seq[Int], Seq[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val (ids1, toks1) = out(1L)
    // in-vocab tokens map through the table exactly
    assert(ids1 == toks1.map(v), s"$ids1 vs $toks1")
    // Ω never appeared in training: its symbol id must be <unk>=0
    val (ids2, toks2) = out(2L)
    assert(toks2.contains("Ω") || toks2.exists(_.contains("Ω")))
    assert(ids2.contains(0), ids2.toString)
  }

  test("production-vocab (32k-budget) table: training exhausts the " +
      "sample's pair universe, encode still equals the model, and a word " +
      "costs at most len(word) merges regardless of table size") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val big = Bpe.train(docs, "text", numMerges = 32768)
    // the sample's pair universe is finite: training must stop at
    // exhaustion (every sampled word one symbol), well under the budget
    assert(big.nonEmpty && big.length < 32768,
      s"expected early exhaustion, got ${big.length} merges")
    // clean-room model with the big table on real corpus words: vocab
    // size must not change WHAT encode computes
    val rank = big.zipWithIndex.toMap
    def model(word: String): Seq[String] = {
      var syms = word.codePoints().toArray.toSeq
        .map(cp => new String(Character.toChars(cp))) :+ "</w>"
      var done = false
      while (!done && syms.length > 1) {
        val cands = syms.zip(syms.tail).zipWithIndex
          .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
        if (cands.isEmpty) done = true
        else {
          val (_, i) = cands.min
          syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
        }
      }
      syms
    }
    val words = docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "").distinct().as[String].collect().take(200)
    val got = words.toSeq.toDF("w")
      .select(col("w"), Bpe.encode(col("w"), big).as("t"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach(w => assert(got(w) == model(w), s"word '$w'"))
  }

  test("the per-thread word memo hits on repeated words (Zipfian corpus: " +
      "encode cost tracks distinct words, not occurrences)") {
    import graft.functions.BpeEncode
    val docs = graft.core.Tables(spark, sfDir, "documents")
    BpeEncode.resetStats()
    BpeEncode.statsEnabled = true
    try {
      docs.select(Bpe.tokenCount(col("text"), merges).as("n"))
        .agg(sum(col("n"))).collect()
    } finally BpeEncode.statsEnabled = false
    val hits = BpeEncode.memoHits.get()
    val misses = BpeEncode.memoMisses.get()
    assert(hits + misses > 0, "no words encoded?")
    val rate = hits.toDouble / (hits + misses)
    // natural text repeats words heavily; even at sf0.001 with 4 test
    // threads (each with its own memo) well over half the occurrences
    // must be memo hits
    assert(rate > 0.5, s"memo hit rate $rate (hits=$hits misses=$misses)")
  }

  test("tokenCount sums words; empty and whitespace-only docs count 0") {
    val out = Seq((1L, "the the"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.tokenCount(col("text"), merges).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 2L && out(2L) == 0L && out(3L) == 0L)
  }
}
