package graft

import org.apache.spark.sql.functions._
import graft.text.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable: disjoint vocabularies
  private val docs = Seq(
    (1L, "good clean prose here", "pos"),
    (2L, "more good clean text", "pos"),
    (3L, "spam junk casino click", "neg"),
    (4L, "junk spam buy casino now", "neg"),
    (5L, "", "neg")).toDF("doc_id", "text", "tag")
  private val label = when(col("tag") === "pos", 1L).otherwise(-1L)

  test("naive bayes separates disjoint-vocabulary classes") {
    val w = Classifier.trainNaiveBayes(docs, "doc_id", "text", label,
      buckets = 4096)
    val preds = Classifier.score(docs, "doc_id", "text", w, 4096)
      .select("doc_id", "pred").as[(Long, Long)].collect().toMap
    assert(preds(1L) == 1L && preds(2L) == 1L, s"got $preds")
    assert(preds(3L) == -1L && preds(4L) == -1L, s"got $preds")
    // the zero-token doc classifies by the log-prior bias alone
    // (2 positive vs 3 negative docs -> negative prior)
    assert(preds(5L) == -1L, s"got $preds")
    // the reserved bias bucket carries the prior
    assert(w.where(col("bucket") === 4096L).count() == 1)
  }

  test("naive bayes training is partitioning-independent (fx-exact)") {
    val w1 = Classifier.trainNaiveBayes(docs, "doc_id", "text", label, 512)
      .orderBy("bucket").collect().toSeq
    val w2 = Classifier.trainNaiveBayes(docs.repartition(7), "doc_id",
        "text", label, 512)
      .orderBy("bucket").collect().toSeq
    assert(w1 == w2)
  }

  test("perceptron separates disjoint-vocabulary classes") {
    val w = Classifier.trainPerceptron(docs, "doc_id", "text", label,
      buckets = 4096, epochs = 3)
    val preds = Classifier.score(docs, "doc_id", "text", w, 4096)
      .select("doc_id", "pred").as[(Long, Long)].collect().toMap
    assert(preds(1L) == 1L && preds(2L) == 1L, s"got $preds")
    assert(preds(3L) == -1L && preds(4L) == -1L, s"got $preds")
    graft.core.Intermediates.release()
  }

  test("perceptron training is partitioning-independent (integer batch)") {
    val w1 = Classifier.trainPerceptron(docs, "doc_id", "text", label,
        buckets = 512, epochs = 2)
      .orderBy("bucket").collect().toSeq
    graft.core.Intermediates.release()
    val w2 = Classifier.trainPerceptron(docs.repartition(7), "doc_id",
        "text", label, buckets = 512, epochs = 2)
      .orderBy("bucket").collect().toSeq
    graft.core.Intermediates.release()
    assert(w1 == w2)
  }

  test("reserved id-column names fail fast instead of silently shadowing") {
    val bad = docs.withColumnRenamed("doc_id", "bucket")
    val e1 = intercept[IllegalArgumentException] {
      Classifier.trainNaiveBayes(bad, "bucket", "text", label, 64)
    }
    assert(e1.getMessage.contains("collides"))
    val e2 = intercept[IllegalArgumentException] {
      graft.text.Dsir.importanceFx(bad, bad, "bucket", "text", 64)
    }
    assert(e2.getMessage.contains("collides"))
  }

  test("scoring an out-of-vocabulary doc sees only the bias weight") {
    val w = Classifier.trainPerceptron(docs, "doc_id", "text", label,
      buckets = 4096, epochs = 1)
    val oov = Seq((9L, "wholly unseen tokens")).toDF("doc_id", "text")
    val got = Classifier.score(oov, "doc_id", "text", w, 4096)
      .select("doc_id", "margin", "pred").as[(Long, Long, Long)].collect()
    // epoch 1 misclassifies everything (all margins 0), so the bias
    // weight is exactly sum(y) = 2 - 3 = -1; unseen tokens weigh 0
    assert(got.toSeq == Seq((9L, -1L, -1L)), got.toSeq.toString)
    graft.core.Intermediates.release()
  }

  test("precisionAtDepth: hand-computed curve, tie determinism under " +
      "hostile repartitioning, reserved-column fail-fast") {
    import org.apache.spark.sql.functions._
    // 8 rows, scores with a tie at 30 (ids 3,4): rank order by
    // (score desc, id asc) is ids 1,2,3,4,5,6,7,8; labels: top half
    // 3 of 4 positive, bottom half 1 of 4
    val df = Seq(
      (1L, 90L, 1L), (2L, 50L, 1L), (3L, 30L, 0L), (4L, 30L, 1L),
      (5L, 20L, 0L), (6L, 10L, 1L), (7L, 5L, 0L), (8L, 1L, 0L))
      .toDF("id", "score", "y")
    def curve(d: org.apache.spark.sql.DataFrame) =
      Classifier.precisionAtDepth(d, col("score"), col("y"), col("id"),
        steps = 4)
        .orderBy("pct").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSeq
    val got = curve(df)
    // steps=4 → quartiles of 2: (1,2):2pos; (3,4):+1; (5,6):+1; (7,8):+0
    assert(got == Seq(
      (1L, 2L, 2L, 1.0, 0.5),
      (2L, 4L, 3L, 0.75, 0.75),
      (3L, 6L, 4L, 4.0 / 6.0, 1.0),
      (4L, 8L, 4L, 0.5, 1.0)), got.toString)
    assert(curve(df.repartition(7, col("y"))) == got)
    val e = intercept[IllegalArgumentException] {
      Classifier.precisionAtDepth(df.withColumn("pct", lit(1)),
        col("score"), col("y"), col("id"))
    }
    assert(e.getMessage.contains("reserved"))
    graft.core.Intermediates.release()
  }
}
