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
  }
}
