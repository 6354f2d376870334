package graft

import org.apache.spark.sql.functions._
import graft.text.Winnow

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  // ---- plain-Scala reference model -------------------------------------
  private def toks(s: String): Seq[String] =
    s.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  private def gramHash(g: Seq[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(g.mkString("\u001F").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def model(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val t = toks(text)
    if (t.size < k + w - 1) Set.empty
    else {
      val hs = t.sliding(k).filter(_.size == k).map(gramHash).toVector
      (w - 1 until hs.size).map { e =>
        val win = hs.slice(e - w + 1, e + 1)
        val mn = win.min
        val pos = e - win.reverse.indexOf(mn)
        (pos.toLong, mn)
      }.toSet
    }
  }

  test("winnow equals the plain-Scala model on seeded random docs") {
    val rnd = new scala.util.Random(77)
    val vocab = Vector.tabulate(25)(i => s"t$i")
    val docs = (0 until 30).map { i =>
      (i.toLong,
        Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    }
    val got = Winnow.winnow(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    docs.foreach { case (id, text) =>
      val want = model(text, 4, 4)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
  }

  test("guarantee: a shared substring of w+k-1 tokens shares a fingerprint") {
    // docs share exactly the 7-token run "a b c d e f g" (= w+k-1)
    val docs = Seq(
      (1L, "a b c d e f g h i j k"),
      (2L, "x y z a b c d e f g q r s")).toDF("doc_id", "text")
    val fps = Winnow.winnow(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    val f1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert((f1 & f2).nonEmpty)
  }

  test("short docs emit nothing; winnowPairs finds the planted overlap") {
    val docs = Seq(
      (1L, "common boiler plate run of shared tokens here padded out"),
      (2L, "zz common boiler plate run of shared tokens here also yy"),
      (3L, "totally unrelated words qq ww ee rr tt uu ii oo pp aa"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    assert(Winnow.winnow(docs.where(col("doc_id") === 4), "doc_id", "text")
      .count() == 0)
    val pairs = Winnow.winnowPairs(docs, "doc_id", "text", minShared = 1)
      .as[(Long, Long, Long)].collect()
    graft.core.Intermediates.release()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L), pairs.toSeq.toString)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dedupLines strips corpus-common lines, keeps order, drops " +
      "all-boilerplate docs") {
    val docs = Seq(
      (1L, "BOILER\nkeep one\nBOILER\nkeep two"),
      (2L, "keep three\nBOILER"),
      (3L, "BOILER"), // nothing survives -> doc drops out
      (4L, "solo line here")).toDF("doc_id", "text")
    val out = graft.text.TextOps.dedupLines(docs, "doc_id", "text",
        maxDf = 2)
      .as[(Long, String)].collect().toMap
    // BOILER appears in 3 docs > maxDf=2 -> removed everywhere
    assert(out(1L) == "keep one\nkeep two", out(1L))
    assert(out(2L) == "keep three")
    assert(!out.contains(3L))
    assert(out(4L) == "solo line here")
  }

  test("df-capped fingerprints are dropped from the pair index") {
    // the same boilerplate in EVERY doc; maxDf=2 excludes it, so no pairs
    val docs = (1L to 5L).map(i =>
      (i, s"shared boiler plate gram run common padded $i"))
      .toDF("doc_id", "text")
    val pairs = Winnow.winnowPairs(docs, "doc_id", "text",
      minShared = 1, maxDf = 2)
    assert(pairs.count() == 0)
    graft.core.Intermediates.release()
  }
}
