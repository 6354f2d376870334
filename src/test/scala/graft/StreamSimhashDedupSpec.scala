package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/** Streaming SimHash near-dup dedup (#47e): cross-batch representative
  * persistence, equality with the batch min-id-rep model across random
  * batch cuts, and the pigeonhole recall guarantee vs representatives. */
class StreamSimhashDedupSpec extends SparkSpec {
  import spark.implicits._

  /** The batch model the stream must reproduce on in-order feeds: doc d
    * is flagged against rep r = the min-id occupant of one of d's
    * chunk buckets, iff r < d and hamming(r, d) ≤ maxDist; verdict =
    * the min such rep. */
  private def batchModel(docs: Seq[(Long, String)],
                         maxDist: Int): Map[Long, (Long, Int)] = {
    val sigs = docs.map { case (id, text) =>
      id -> graft.dedup.Dedup.simhash(
        Seq((id, text)).toDF("id", "text"), "id", "text")
        .select("simhash").as[Long].head()
    }.toMap
    val chunks = maxDist + 1
    val width = 64 / chunks
    val mask = (1L << width) - 1
    val buckets = scala.collection.mutable.Map.empty[(Int, Long), Long]
    docs.map(_._1).sorted.foreach { id =>
      (0 until chunks).foreach { c =>
        val cv = (sigs(id) >>> (c * width)) & mask
        buckets.getOrElseUpdate((c, cv), id)
      }
    }
    docs.map(_._1).flatMap { id =>
      val hits = (0 until chunks).flatMap { c =>
        val cv = (sigs(id) >>> (c * width)) & mask
        val rep = buckets((c, cv))
        val ham = java.lang.Long.bitCount(sigs(id) ^ sigs(rep))
        if (rep < id && ham <= maxDist) Some((rep, ham)) else None
      }
      if (hits.isEmpty) None else Some(id -> hits.min)
    }.toMap
  }

  private val corpus: Seq[(Long, String)] = {
    // 30 distinct docs; verbatim copies of the first 5 (Hamming 0 —
    // guaranteed flags) and append-one-token copies of the next 5
    // (near-dups whose Hamming depends on the vote margins — the
    // differential test covers however they land)
    val base = (0L until 30L).map(i =>
      i -> (s"document $i carries words w${i}a w${i}b w${i}c w${i}d " +
        s"w${i}e w${i}f w${i}g w${i}h"))
    val verbatim = (0L until 5L).map(i => (100L + i) -> base(i.toInt)._2)
    val near = (5L until 10L).map(i =>
      (100L + i) -> (base(i.toInt)._2 + " extra"))
    base ++ verbatim ++ near
  }

  test("bounded stream equals the batch min-id-rep model across random batch cuts") {
    implicit val sqlCtx = spark.sqlContext
    val expected = batchModel(corpus, maxDist = 3)
    assert(expected.nonEmpty, "planted dups must be flagged")
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val input = MemoryStream[(Long, String)]
      val hits = Streams.streamSimhashDedup(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", maxDist = 3)
      val q = Streams.memorySink(hits.toDF(), s"sdh_spec_$trial",
        OutputMode.Append())
      // feed in id order with random batch boundaries (the in-order
      // contract; reps must persist across batches)
      var rest = corpus.sortBy(_._1)
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(rest.size)
        input.addData(rest.take(n))
        q.processAllAvailable()
        rest = rest.drop(n)
      }
      val got = spark.table(s"sdh_spec_$trial")
        .groupBy(col("docId"))
        .agg(min(struct(col("dupOf"), col("hamming"))).as("m"))
        .select(col("docId"), col("m.dupOf"), col("m.hamming"))
        .as[(Long, Long, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      q.stop()
      assert(got == expected, s"trial $trial diverged from the batch model")
    }
  }

  test("planted near-copies are flagged against their originals") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val hits = Streams.streamSimhashDedup(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", maxDist = 3)
    val q = Streams.memorySink(hits.toDF(), "sdh_planted", OutputMode.Append())
    input.addData(corpus.sortBy(_._1))
    q.processAllAvailable()
    val flagged = spark.table("sdh_planted")
      .select("docId").as[Long].collect().toSet
    q.stop()
    (100L until 105L).foreach(d =>
      assert(flagged.contains(d), s"verbatim copy $d must be flagged"))
  }

  test("empty docs are filtered, not clustered into one zero-sig bucket") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val hits = Streams.streamSimhashDedup(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", maxDist = 3)
    val q = Streams.memorySink(hits.toDF(), "sdh_empty", OutputMode.Append())
    input.addData(Seq((1L, ""), (2L, "   "), (3L, ""), (4L, "real text here")))
    q.processAllAvailable()
    val rows = spark.table("sdh_empty").count()
    q.stop()
    assert(rows == 0, "blank docs must not pair with each other")
  }
}
