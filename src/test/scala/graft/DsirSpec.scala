package graft

import org.apache.spark.sql.functions._
import graft.text.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta alpha gamma"),
    (2L, "delta epsilon zeta eta"),
    (3L, "alpha alpha alpha alpha"),
    (4L, "")).toDF("doc_id", "text")
  // target domain speaks "alpha"
  private val target = Seq(
    (100L, "alpha alpha beta"),
    (101L, "alpha gamma")).toDF("doc_id", "text")

  test("docFeatures counts unigrams + bigrams; empty docs emit nothing") {
    val f = Dsir.docFeatures(corpus, "doc_id", "text", buckets = 1 << 20)
    val perDoc = f.groupBy("doc_id").agg(sum("cnt").as("n"))
      .as[(Long, Long)].collect().toMap
    // n tokens + (n-1) bigrams = 2n-1
    assert(perDoc == Map(1L -> 7L, 2L -> 7L, 3L -> 7L), s"got $perDoc")
    // doc 3 is one repeated token: 1 unigram bucket + 1 bigram bucket
    assert(f.where(col("doc_id") === 3).count() == 2)
  }

  test("importanceFx ranks target-like docs above off-domain docs") {
    val sc = Dsir.importanceFx(corpus, target, "doc_id", "text",
        buckets = 4096)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // alpha-heavy docs must outscore the all-off-domain doc 2
    assert(sc(1L) > sc(2L) && sc(3L) > sc(2L), s"got $sc")
    // the empty doc has no features and therefore no row
    assert(!sc.contains(4L))
  }

  test("importanceFx is partitioning-independent (exact integer math)") {
    val a = Dsir.importanceFx(corpus, target, "doc_id", "text", 512)
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceFx(corpus.repartition(7),
        target.repartition(3), "doc_id", "text", 512)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("empty target degrades to a constant shift, not a crash") {
    val sc = Dsir.importanceFx(corpus, target.limit(0), "doc_id", "text",
        buckets = 256)
      .as[(Long, Long, Long)].collect()
    assert(sc.length == 3) // still one row per non-empty doc
  }
}
