package graft

import org.apache.spark.sql.functions._
import graft.piglatin.PigScript

/** The LLM-curation layer from the .pig front end (graft dialect):
  * DEDUP / QUALITY / TOKENIZE_DOCS statements compile to the same
  * engine primitives the oracled queries use. */
class LlmDialectSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // verbatim dup of 1
    (3L, "quick brown fox jumps over the lazy dog"),     // near-dup of 1
    (4L, "an entirely different document about spark engines"),
    (5L, null.asInstanceOf[String])                       // unknown content
  ).toDF("doc_id", "text")

  test("WarcStorage STORE fails fast without uri/payload fields; " +
      "EXTRACT_TEXT builtin strips markup in a FOREACH") {
    val e = intercept[Exception] {
      PigScript.run(spark,
        "STORE docs INTO 'target/graft-test/warc-bad' USING WarcStorage();",
        tables = Map("docs" -> docs))
    }
    assert(e.getMessage.contains("WarcStorage"))
    val pages = docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        concat(lit("<html><body><p>"), col("text"),
          lit("</p><script>x()</script></body></html>")).as("page"))
    val out = PigScript.query(spark,
      "r = FOREACH pages GENERATE doc_id, EXTRACT_TEXT(page) AS t;",
      "r", tables = Map("pages" -> pages))
      .select("doc_id", "t").as[(Long, String)].collect().toMap
    assert(out(1L) == "the quick brown fox jumps over the lazy dog")
    assert(out(4L) == "an entirely different document about spark engines")
  }

  test("FIX_MOJIBAKE and COMPRESSION_RATIO builtins work in a FOREACH") {
    val d = Seq((1L, "CafÃ© â€” ok"), (2L, "aaaa aaaa aaaa aaaa aaaa"))
      .toDF("id", "t")
    val out = PigScript.query(spark,
      """r = FOREACH d GENERATE id, FIX_MOJIBAKE(t) AS f,
           COMPRESSION_RATIO(t) AS cr;""",
      "r", tables = Map("d" -> d))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(out(1L)._1 == "Café — ok")
    assert(out(2L)._2 < 1.0) // repetitive text compresses
  }

  test("LOAD USING WarcStorage('stream') yields a streaming relation " +
      "that composes with the streaming audit statements") {
    val dir = new java.io.File("target/graft-test/warc-dialect-stream")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    if (dir.exists()) rm(dir)
    graft.sources.Warc.write(docs.where(col("text").isNotNull),
      dir.getAbsolutePath,
      uri = concat(lit("u:"), col("doc_id")), payload = col("text"),
      gzip = true)
    val rel = PigScript.query(spark,
      s"""w = LOAD '${dir.getAbsolutePath}' USING WarcStorage('stream');
          t = FOREACH w GENERATE TOSTRING(content) AS doc;
          h = HEAVY_HITTERS t BY doc TOP 3 USING exact;""",
      "h")
    assert(rel.isStreaming)
    val q = rel.writeStream.queryName("warc_dialect_stream")
      .outputMode("complete").format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("warc_dialect_stream").count()
    assert(got == 3)
  }

  test("DEDUP USING exact keeps the min-id representative and null text") {
    val kept = PigScript.query(spark,
      "d = DEDUP docs BY doc_id, text USING exact;",
      "d", tables = Map("docs" -> docs))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L)) // 2 is the verbatim copy of 1
  }

  test("DEDUP USING minhash drops near-duplicates too") {
    val kept = PigScript.query(spark,
      "d = DEDUP docs BY doc_id, text USING minhash(numhashes=48, " +
        "bands=16, threshold=0.5);",
      "d", tables = Map("docs" -> docs))
      .select("doc_id").as[Long].collect().toSet
    // 1,2,3 form one near-dup component -> representative 1 survives
    assert(kept == Set(1L, 4L, 5L), kept.toString)
  }

  test("DEDUP on a streaming relation runs the stateful simhash scan; " +
      "batch-only methods fail fast") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val hits = PigScript.query(spark,
      "d = DEDUP docs BY doc_id, text USING simhash(maxdist=3);",
      "d", tables = Map("docs" -> input.toDF().toDF("doc_id", "text")))
    assert(hits.isStreaming)
    val q = graft.streaming.Streams.memorySink(hits, "pig_stream_dedup",
      org.apache.spark.sql.streaming.OutputMode.Append())
    input.addData((1L, "the quick brown fox jumps over the lazy dog"),
      (4L, "a totally different document"))
    q.processAllAvailable()
    input.addData((7L, "the quick brown fox jumps over the lazy dog"))
    q.processAllAvailable()
    val rows = spark.table("pig_stream_dedup")
      .select("docId", "dupOf", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    q.stop()
    assert(rows == Set((7L, 1L, 0)),
      "the cross-batch verbatim copy must be flagged against doc 1")
    val err = intercept[RuntimeException] {
      PigScript.query(spark,
        "d = DEDUP docs BY doc_id, text USING exact;",
        "d", tables = Map("docs" -> input.toDF().toDF("doc_id", "text")))
        .count()
    }
    assert(err.getMessage.contains("streaming relation supports USING simhash"))
  }

  test("QUALITY appends a score; USING gopher appends the keep flag") {
    val q = PigScript.query(spark,
      "q = QUALITY docs BY text;", "q", tables = Map("docs" -> docs))
    assert(q.columns.contains("quality"))
    val g = PigScript.query(spark,
      "g = QUALITY docs BY text USING gopher;", "g",
      tables = Map("docs" -> docs))
    // short docs fail the >= 50-word rule
    assert(g.where(col("keep")).count() == 0)
    assert(g.count() == 5)
  }

  test("TOKENIZE_DOCS: whitespace default and learned BPE") {
    val ws = PigScript.query(spark,
      "t = TOKENIZE_DOCS docs BY text;", "t", tables = Map("docs" -> docs))
      .where(col("doc_id") === 1L)
      .select(col("tokens")).as[Seq[String]].head()
    assert(ws.head == "the" && ws.size == 9)
    val bpe = PigScript.query(spark,
      "t = TOKENIZE_DOCS docs BY text USING bpe(merges=50);",
      "t", tables = Map("docs" -> docs))
      .where(col("doc_id") === 4L)
      .select(col("tokens")).as[Seq[String]].head()
    // BPE tokens concatenate back to the words + terminal markers
    assert(bpe.mkString == "an entirely different document about spark engines"
      .split(" ").map(_ + "</w>").mkString)
  }

  test("TOKENIZE_DOCS USING bpe retrains after an alias is rebound " +
      "(memo keys on the relation, not the alias name)") {
    // corpus A teaches merges for 'aaaa'; corpus B for 'bbbb'. A memo
    // keyed by alias NAME would serve A's table to the rebound docs,
    // leaving B's word an unmerged character sequence.
    val a = Seq((1L, "aaaa aaaa aaaa aaaa")).toDF("doc_id", "text")
    val b = Seq((1L, "bbbb bbbb bbbb bbbb")).toDF("doc_id", "text")
    val c = PigScript.run(spark,
      """t1 = TOKENIZE_DOCS docs BY text USING bpe(merges=50);
        |docs = FOREACH other GENERATE doc_id, text;
        |t2 = TOKENIZE_DOCS docs BY text USING bpe(merges=50);
        |""".stripMargin,
      tables = Map("docs" -> a, "other" -> b))
    val t1 = c.relation("t1").select(col("tokens")).as[Seq[String]].head()
    val t2 = c.relation("t2").select(col("tokens")).as[Seq[String]].head()
    assert(t1 == Seq.fill(4)("aaaa</w>"), t1.toString)
    assert(t2 == Seq.fill(4)("bbbb</w>"),
      s"rebound alias must retrain on the new relation: $t2")
  }

  test("unknown methods fail fast with the supported list") {
    val err = intercept[RuntimeException] {
      PigScript.query(spark, "d = DEDUP docs BY doc_id, text USING tree;",
        "d", tables = Map("docs" -> docs)).count()
    }
    assert(err.getMessage.contains("unknown DEDUP method"))
    val err2 = intercept[RuntimeException] {
      PigScript.query(spark,
        "d = DECONTAMINATE docs BY doc_id, text AGAINST docs BY doc_id, " +
          "text USING magic;",
        "d", tables = Map("docs" -> docs)).count()
    }
    assert(err2.getMessage.contains("unknown DECONTAMINATE method"))
    val err3 = intercept[RuntimeException] {
      PigScript.query(spark,
        "d = SCORE docs BY doc_id, text USING forest(labels=doc_id);",
        "d", tables = Map("docs" -> docs)).count()
    }
    assert(err3.getMessage.contains("unknown SCORE method"))
    val err4 = intercept[RuntimeException] {
      PigScript.query(spark, "p = PROFILE docs ON doc_id USING census;",
        "p", tables = Map("docs" -> docs)).count()
    }
    assert(err4.getMessage.contains("unknown PROFILE method"))
    val err5 = intercept[RuntimeException] {
      PigScript.query(spark,
        "h = HEAVY_HITTERS docs BY text TOP 3 USING cms;",
        "h", tables = Map("docs" -> docs)).count()
    }
    assert(err5.getMessage.contains("unknown HEAVY_HITTERS method"))
  }

  test("PROFILE emits one audit row per column; USING sketch matches " +
      "counts and adds quantiles") {
    val p = PigScript.query(spark,
      "p = PROFILE docs ON doc_id, text;",
      "p", tables = Map("docs" -> docs))
    assert(p.columns.toSeq ===
      Seq("col_name", "n_nonnull", "n_null", "n_distinct", "min_val",
        "max_val"))
    val byCol = p.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byCol("doc_id") === ((5L, 0L, 5L)))
    assert(byCol("text") === ((4L, 1L, 3L))) // 2 dups the text of 1
    val sk = PigScript.query(spark,
      "p = PROFILE docs ON doc_id USING sketch(rsd=0.01);",
      "p", tables = Map("docs" -> docs)).collect().head
    assert(sk.getLong(1) === 5L && sk.getDouble(6) === 2.0) // p25 of 1..5
  }

  test("HEAVY_HITTERS ranks frequent values; USING sketch brackets them") {
    val toks = docs.where(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("tok"))
    val top = PigScript.query(spark,
      "h = HEAVY_HITTERS toks BY tok TOP 2;",
      "h", tables = Map("toks" -> toks))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head === (("the", 5L))) // docs 1,2: ×2 each; doc 3: ×1
    val sk = PigScript.query(spark,
      "h = HEAVY_HITTERS toks BY tok TOP 2 USING sketch(capacity=64);",
      "h", tables = Map("toks" -> toks))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sk.head._1 === "the" && sk.head._2 === 5L && sk.head._3 === 5L)
  }

  test("DECONTAMINATE drops corpus docs leaking benchmark n-grams " +
      "(clean ≡ engine; report lists them)") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("bid", "btext")
    val cleaned = PigScript.query(spark,
      "c = DECONTAMINATE docs BY doc_id, text AGAINST bench BY bid, " +
        "btext USING clean(n=8);",
      "c", tables = Map("docs" -> docs, "bench" -> bench))
      .select("doc_id").as[Long].collect().toSet
    val want = graft.text.Decontaminate.clean(docs, "doc_id", "text",
      bench, "bid", "btext", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(cleaned == want)
    assert(!cleaned(1L) && !cleaned(2L), "8-gram leaks must be dropped")
    val report = PigScript.query(spark,
      "r = DECONTAMINATE docs BY doc_id, text AGAINST bench BY bid, " +
        "btext USING report(n=8);",
      "r", tables = Map("docs" -> docs, "bench" -> bench))
    assert(report.columns.toSet ==
      Set("doc_id", "matched_ngrams", "bench_docs"))
    // docs 1/2 contain the full bench text; doc 3's 8 tokens form
    // exactly the bench doc's trailing 8-gram — all three leak
    assert(report.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
    // bloom / bloom_report: the prefiltered paths must be output-
    // identical to their exact counterparts from the script too
    val bloomClean = PigScript.query(spark,
      "c = DECONTAMINATE docs BY doc_id, text AGAINST bench BY bid, " +
        "btext USING bloom(n=8, fpp=0.01);",
      "c", tables = Map("docs" -> docs, "bench" -> bench))
      .select("doc_id").as[Long].collect().toSet
    assert(bloomClean == cleaned)
    val bloomReport = PigScript.query(spark,
      "r = DECONTAMINATE docs BY doc_id, text AGAINST bench BY bid, " +
        "btext USING bloom_report(n=8);",
      "r", tables = Map("docs" -> docs, "bench" -> bench))
    assert(bloomReport.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
  }

  test("PACK lays out the concat-and-chunk stream (string BY token-" +
      "counts; numeric BY uses the precomputed count)") {
    val packed = PigScript.query(spark,
      "p = PACK docs ON doc_id BY text INTO 10;",
      "p", tables = Map("docs" -> docs))
      .select("doc_id", "n_tok", "tok_start").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // doc 1: 9 tokens at offset 0; doc 2: 9 at 9; doc 3: 8 at 18 …
    assert(packed.take(3).toSeq ==
      Seq((1L, 9L, 0L), (2L, 9L, 9L), (3L, 8L, 18L)))
    val pre = PigScript.query(spark,
      """n = FOREACH docs GENERATE doc_id, 5 AS cnt;
        |p = PACK n ON doc_id BY cnt INTO 10;""".stripMargin,
      "p", tables = Map("docs" -> docs))
      .select("doc_id", "tok_start", "seq_first").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(pre.map(_._2).toSeq == Seq(0L, 5L, 10L, 15L, 20L))
  }

  test("SPLIT_HASH assigns deterministic named splits summing to 100") {
    val sp = PigScript.query(spark,
      "sp = SPLIT_HASH docs BY doc_id INTO train 80, val 10, test 10;",
      "sp", tables = Map("docs" -> docs))
    assert(sp.columns.contains("split"))
    val want = graft.core.Pipe(docs)
      .splitByHash(Seq("train" -> 80, "val" -> 10, "test" -> 10),
        col("doc_id")).df
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(sp.select("doc_id", "split").as[(Long, String)]
      .collect().toSet == want)
  }

  test("SCORE trains in-script on labels= and separates the classes; " +
      "WITH applies precomputed weights identically") {
    val labeled = docs.where(col("text").isNotNull)
      .withColumn("y", when(col("doc_id") <= 3, 1L).otherwise(-1L))
    val scored = PigScript.query(spark,
      "s = SCORE docs BY doc_id, text USING classifier(labels=y, " +
        "buckets=64);",
      "s", tables = Map("docs" -> labeled))
    assert(scored.columns.contains("margin") &&
      scored.columns.contains("pred"))
    // NB on this toy corpus separates the fox docs from the spark doc
    val preds = scored.select("doc_id", "pred").as[(Long, Long)]
      .collect().toMap
    assert(preds(1L) == 1L && preds(4L) == -1L, preds.toString)
    // WITH: weights trained by a prior statement apply the same model
    val c = PigScript.run(spark,
      """s1 = SCORE docs BY doc_id, text USING classifier(labels=y,
        |  buckets=64);""".stripMargin,
      tables = Map("docs" -> labeled))
    val w = graft.text.Classifier.trainNaiveBayes(labeled, "doc_id",
      "text", col("y"), buckets = 64)
    val viaWith = PigScript.query(spark,
      "s2 = SCORE docs BY doc_id, text WITH w USING classifier(" +
        "buckets=64);",
      "s2", tables = Map("docs" -> labeled, "w" -> w))
      .select("doc_id", "margin").as[(Long, Long)].collect().toSet
    assert(viaWith == c.relation("s1").select("doc_id", "margin")
      .as[(Long, Long)].collect().toSet)
  }
}
