package graft

import org.apache.spark.sql.functions._
import graft.text.SubstringDedup

/** Repeated-substring excision vs an independent plain-Scala model on
  * seeded random small-vocab corpora (repeats arise by construction),
  * plus the planted cases the oracled query uses: cross-doc boilerplate
  * is removed everywhere but its globally first occurrence, within-doc
  * repeats are removed, and unique text is untouched. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def model(docs: Seq[(Long, String)],
                    k: Int): Map[Long, (String, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> Option(t).getOrElse("").split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val occ = for {
      (id, _) <- docs
      ts = toks(id)
      p <- 0 to ts.length - k
    } yield (ts.slice(p, p + k).mkString(""), id, p)
    val dupOcc = occ.groupBy(_._1).values.filter(_.size >= 2).flatMap { os =>
      val positions = os.map(o => (o._2, o._3))
      positions.filterNot(_ == positions.min)
    }
    val covered = dupOcc.flatMap { case (id, p) =>
      (p until p + k).map(id -> _) }.toSet
    docs.map { case (id, _) =>
      val ts = toks(id)
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !covered((id, i)) => t }
      id -> (kept.mkString(" "), (ts.length - kept.length).toLong)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], k: Int): Map[Long, (String, Long)] =
    SubstringDedup.exciseRepeated(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = k)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("equals the plain-Scala model on seeded random small-vocab docs") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e")
      val docs = (0L until 30L).map(i =>
        (i, Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(5))).mkString(" ")))
      for (k <- Seq(3, 5))
        assert(run(docs, k) == model(docs, k), s"seed=$seed k=$k")
    }
  }

  test("cross-doc boilerplate survives only at its first occurrence; " +
      "unique text is untouched; short docs pass through") {
    val boiler = "shared boilerplate block repeated verbatim here"
    val docs = Seq(
      (1L, s"alpha beta gamma delta $boiler"),
      (2L, s"epsilon zeta eta theta $boiler iota"),
      (3L, "totally unique words nothing repeats in this document"),
      (4L, "tiny doc"),
      (5L, ""))
    val got = run(docs, 4)
    assert(got(1L) == (docs.head._2, 0L)) // first occurrence keeps it
    assert(got(2L) ==
      ("epsilon zeta eta theta iota", 6L), got(2L)) // 6 boiler tokens gone
    assert(got(3L) == (docs(2)._2, 0L))
    assert(got(4L) == ("tiny doc", 0L))
    assert(got(5L) == ("", 0L))
    assert(run(docs, 4) == model(docs, 4))
  }

  test("within-doc repeats beyond the first occurrence are excised") {
    val docs = Seq((9L, "one two three four filler one two three four"))
    val got = run(docs, 4)
    assert(got(9L) == ("one two three four filler", 4L), got(9L))
  }
}
