package graft

import org.apache.spark.sql.functions._
import graft.text.Vocab

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "the cat sat on the mat",
    "the dog ate   the cat food",
    "Cat CAT the\tdog\nzebra").toDF("text")

  test("counts match a brute-force tally; lowercase folds variants") {
    val out = Vocab.topTokens(docs, col("text"), minCount = 1L, k = 100)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val truth = docs.as[String].collect()
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(_.toLowerCase).view.mapValues(_.length.toLong).toMap
    assert(out == truth)
    assert(out("cat") == 4L) // cat + Cat + CAT folded
  }

  test("minCount prunes, k caps, ties order by token asc, rank is dense") {
    val out = Vocab.topTokens(docs, col("text"), minCount = 2L, k = 3)
      .collect()
    // counts: the=5, cat=4, dog=2 — everything else below 2
    assert(out.map(_.getString(1)).toSeq == Seq("the", "cat", "dog"))
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // tie ordering: equal-count tokens sort ascending
    val tied = Vocab.topTokens(Seq("b a c b a c").toDF("text"),
      col("text"), 1L, 10).collect().map(_.getString(1)).toSeq
    assert(tied == Seq("a", "b", "c"))
  }

  test("lowercase=false keeps case-distinct tokens") {
    val out = Vocab.topTokens(docs, col("text"), 1L, 100,
      lowercase = false).collect().map(r => r.getString(1)).toSet
    assert(out.contains("Cat") && out.contains("CAT") &&
      out.contains("cat"))
  }

  test("oovRate counts against the vocab with the same case folding; " +
      "empty docs re-attach with rate 0.0; all-OOV docs rate 1.0") {
    val corpus = Seq((1L, "the the CAT sat"), (2L, "zzz qqq"),
      (3L, "   "), (4L, "THE cat")).toDF("id", "text")
    val vocab = Seq("the", "cat").zipWithIndex
      .map { case (t, i) => (i.toLong + 1L, t, 10L - i) }
      .toDF("rank", "token", "cnt")
    val out = Vocab.oovRate(corpus, col("id"), col("text"), vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 1L, 0.25)))   // "sat" is OOV; CAT folds in
    assert(out(2L) == ((2L, 2L, 1.0)))    // all OOV
    assert(out(3L) == ((0L, 0L, 0.0)))    // whitespace-only: no problem
    assert(out(4L) == ((2L, 0L, 0.0)))
    val e = intercept[IllegalArgumentException] {
      Vocab.oovRate(corpus, col("id"), col("text"),
        vocab.withColumnRenamed("token", "word"))
    }
    assert(e.getMessage.contains("token"))
  }
}
