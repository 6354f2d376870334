package graft

import org.apache.spark.sql.functions._
import graft.functions.Log2FxExpr
import graft.text.{Classifier, Dsir}

/** Differential tests: Naive Bayes / batch perceptron / DSIR vs
  * independent plain-Scala models on seeded random corpora. Buckets are
  * deliberately SMALL (64) so hash collisions are dense — exactness
  * must survive colliding features, not just the sparse regime. The
  * models reuse only [[Log2FxExpr.log2fx]] (the reference JVM log) and
  * reimplement tokenization/hashing/training from scratch. */
class ClassifierDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  // ---- plain-Scala reference pipeline ----------------------------------
  private def toks(s: String): Seq[String] =
    s.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  private def md5Bucket(f: String, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % b
  }

  /** bucket -> count of hashed unigrams + 0x1F-joined bigrams. */
  private def feats(text: String, b: Int): Map[Long, Long] = {
    val t = toks(text)
    val fs = t ++ t.sliding(2).filter(_.size == 2)
      .map(p => p(0) + "\u001F" + p(1))
    fs.groupBy(md5Bucket(_, b)).map { case (k, v) => k -> v.size.toLong }
  }

  private def L(x: Long): Long = Log2FxExpr.log2fx(x, 1L, 16)

  private def addInto(acc: scala.collection.mutable.Map[Long, Long],
                      m: Map[Long, Long], scale: Long): Unit =
    m.foreach { case (k, v) =>
      acc(k) = acc.getOrElse(k, 0L) + scale * v }

  // seeded random corpus: shared vocab + class-leaning words, collisions
  // guaranteed at B=64
  private val rnd = new scala.util.Random(1234)
  private val vocab = Vector.tabulate(40)(i => s"w$i")
  private val corpus: Seq[(Long, String, Long)] = (0 until 60).map { i =>
    val y = if (i % 2 == 0) 1L else -1L
    val lean = if (y > 0) "alpha" else "omega"
    val n = 3 + rnd.nextInt(15)
    val words = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))) ++
      Seq.fill(rnd.nextInt(3))(lean)
    (i.toLong, words.mkString(" "), y)
  } :+ ((60L, "", -1L)) // zero-token doc
  private def corpusDf = corpus.toDF("doc_id", "text", "y")

  test("trainNaiveBayes + score equals the plain-Scala NB model") {
    val w = Classifier.trainNaiveBayes(corpusDf, "doc_id", "text",
      col("y"), buckets = B)
    val got = Classifier.score(corpusDf, "doc_id", "text", w, B)
      .select("doc_id", "margin").as[(Long, Long)].collect().toMap

    val cp = scala.collection.mutable.Map[Long, Long]()
    val cn = scala.collection.mutable.Map[Long, Long]()
    corpus.foreach { case (_, t, y) =>
      addInto(if (y > 0) cp else cn, feats(t, B), 1L) }
    val (np, nn) = (cp.values.sum, cn.values.sum)
    val dp = corpus.count(_._3 > 0).toLong
    val dn = corpus.size - dp
    val wm: Map[Long, Long] = (cp.keySet ++ cn.keySet).map { bk =>
      bk -> ((L(cp.getOrElse(bk, 0L) + 1) - L(np + B))
        - (L(cn.getOrElse(bk, 0L) + 1) - L(nn + B)))
    }.toMap + (B.toLong -> (L(dp + 1) - L(dn + 1)))
    val want = corpus.map { case (id, t, _) =>
      id -> (feats(t, B) + (B.toLong -> 1L))
        .map { case (bk, c) => c * wm.getOrElse(bk, 0L) }.sum
    }.toMap
    assert(got == want)
  }

  test("trainPerceptron equals the plain-Scala batch model, every epoch") {
    for (epochs <- 1 to 3) {
      val got = Classifier.trainPerceptron(corpusDf, "doc_id", "text",
          col("y"), buckets = B, epochs = epochs)
        .as[(Long, Long)].collect().toMap
      graft.core.Intermediates.release()

      val fb = corpus.map { case (id, t, y) =>
        (id, feats(t, B) + (B.toLong -> 1L), y) }
      var wm = fb.flatMap(_._2.keys).distinct
        .map(_ -> 0L).toMap
      for (_ <- 1 to epochs) {
        val upd = scala.collection.mutable.Map[Long, Long]()
        fb.foreach { case (_, f, y) =>
          val m = f.map { case (bk, c) => c * wm.getOrElse(bk, 0L) }.sum
          if (y * m <= 0) addInto(upd, f, y)
        }
        wm = wm.map { case (bk, v) => bk -> (v + upd.getOrElse(bk, 0L)) }
      }
      assert(got == wm, s"epochs=$epochs")
    }
  }

  test("Dsir.importanceFx equals the plain-Scala model") {
    val target = corpusDf.where(col("y") > 0)
    val got = Dsir.importanceFx(corpusDf, target, "doc_id", "text", B)
      .select("doc_id", "n_feat", "dsir_fx")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    val cr = scala.collection.mutable.Map[Long, Long]()
    val ct = scala.collection.mutable.Map[Long, Long]()
    corpus.foreach { case (_, t, _) => addInto(cr, feats(t, B), 1L) }
    corpus.filter(_._3 > 0)
      .foreach { case (_, t, _) => addInto(ct, feats(t, B), 1L) }
    val (nr, nt) = (cr.values.sum, ct.values.sum)
    val wm: Map[Long, Long] = cr.keySet.map { bk =>
      bk -> ((L(ct.getOrElse(bk, 0L) + 1) - L(nt + B))
        - (L(cr.getOrElse(bk, 0L) + 1) - L(nr + B)))
    }.toMap
    val want = corpus.flatMap { case (id, t, _) =>
      val f = feats(t, B)
      if (f.isEmpty) None
      else Some(id -> (f.values.sum,
        f.map { case (bk, c) => c * wm(bk) }.sum))
    }.toMap
    assert(got == want)
  }
}
