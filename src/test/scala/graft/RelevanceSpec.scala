package graft

import org.apache.spark.sql.functions._
import graft.text.Relevance
import graft.core.Pipe

/** Differential tests for the relevance/split operators: plain-Scala
  * models on the real sf0.001 documents plus synthetic edge docs. */
class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def model(rows: Seq[(Long, String)]) = {
    val toks = rows.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    toks
  }

  private def floorLog2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)

  test("tfIdfTopKExact matches a plain-Scala model on real documents") {
    val rows = docs.as[(Long, String)].collect().toSeq
    val toks = model(rows)
    val n = rows.size.toLong
    val tf = toks.toSeq.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (id, t, g.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    val expected = tf.groupBy(_._1).flatMap { case (id, terms) =>
      val scored = terms.map { case (_, t, f) =>
        val idf = (floorLog2(n) + 1) - floorLog2(df(t))
        (t, f, df(t), f * idf)
      }.sortBy { case (t, _, _, s) => (-s, t) }
      scored.take(3).zipWithIndex.map { case ((t, f, d, s), i) =>
        (id, t, f, d, s, (i + 1).toLong)
      }
    }.toSet
    val got = Relevance.tfIdfTopKExact(docs, "doc_id", "text", k = 3)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("tfIdfTopK (double ln scores) ranks like the model") {
    val sample = Seq(
      (1L, "alpha alpha alpha beta common common"),
      (2L, "beta gamma common common delta"),
      (3L, "common common common epsilon"))
    val d = sample.toDF("doc_id", "text")
    val toks = model(sample)
    val n = sample.size.toDouble
    val tf = toks.toSeq.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (id, t, g.size) } }
    val df = tf.groupBy(_._2).map { case (t, g) => t -> g.size }
    val expected = tf.groupBy(_._1).toSeq.flatMap { case (id, terms) =>
      terms.map { case (_, t, f) => (id, t, f * math.log(n / df(t))) }
        .sortBy { case (_, t2, s) => (-s, t2) }.take(2).map(r => (id, r._2))
    }.toSet
    val got = Relevance.tfIdfTopK(d, "doc_id", "text", k = 2)
      .select(col("doc_id"), col("term")).as[(Long, String)].collect().toSet
    assert(got == expected)
  }

  test("bm25 equals the exact plain-Scala replica (bit-for-bit)") {
    val terms = Seq("spark", "window", "agg")
    val k1 = 1.2; val b = 0.75
    val rows = docs.as[(Long, String)].collect().toSeq
    val toks = model(rows)
    val n = rows.size.toLong
    val sumdl = toks.valuesIterator.map(_.size.toLong).sum
    val avgdl = sumdl.toDouble / n.toDouble
    val dfm = terms.map(t => t -> toks.valuesIterator.count(_.contains(t)).toLong).toMap
    val expected = toks.flatMap { case (id, ts) =>
      val dl = ts.size.toDouble
      val score = terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        val idf = ((floorLog2(n) + 1) - floorLog2(math.max(dfm(t), 1L))).toDouble
        // df = 0 gives tf = 0 everywhere, so the idf value is irrelevant;
        // mirror the engine's bin(0) → length 1 → idf = L anyway
        val idfEff = if (dfm(t) == 0L) (floorLog2(n) + 1).toDouble else idf
        (idfEff * (tf * (k1 + 1.0))) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
      }.reduceLeft(_ + _)
      if (score > 0.0) Some(id -> score) else None
    }
    val got = Relevance.bm25(docs, "doc_id", "text", terms, k1, b)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, s) =>
      assert(s == expected(id), s"doc $id: $s != ${expected(id)}")
    }
  }

  test("bm25 drops docs with no query term and rejects empty/dup terms") {
    val d = Seq((1L, "spark joins data"), (2L, "nothing relevant here"))
      .toDF("doc_id", "text")
    val got = Relevance.bm25(d, "doc_id", "text", Seq("spark"))
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
    intercept[IllegalArgumentException] {
      Relevance.bm25(d, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Relevance.bm25(d, "doc_id", "text", Seq("a", "a"))
    }
  }

  test("floorLog2 column is exact at powers of two") {
    val xs = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, 1L << 40)
    val got = xs.toDF("x").select(Relevance.floorLog2(col("x")))
      .as[Int].collect().toSeq
    assert(got == xs.map(floorLog2))
  }

  test("splitByHash matches the md5 model, is total, and is stable") {
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val got = Pipe(docs).splitByHash(splits, col("doc_id"))
      .generate(col("doc_id"), col("split")).df
      .as[(Long, String)].collect().toMap
    val ids = docs.select("doc_id").as[Long].collect()
    assert(got.keySet == ids.toSet) // total: every row assigned
    val md = java.security.MessageDigest.getInstance("MD5")
    ids.foreach { id =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val bucket = java.lang.Long.parseLong(hex, 16) % 100
      val exp = if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
      assert(got(id) == exp, s"doc $id bucket $bucket")
    }
    // growth stability: adding rows must not move existing assignments
    val grown = Pipe(docs.union(Seq((900001L, "x"), (900002L, "y"))
        .toDF("doc_id", "text")))
      .splitByHash(splits, col("doc_id"))
      .generate(col("doc_id"), col("split")).df
      .as[(Long, String)].collect().toMap
    ids.foreach(id => assert(grown(id) == got(id)))
  }

  test("splitByHash rejects bad percents and column collisions") {
    intercept[IllegalArgumentException] {
      Pipe(docs).splitByHash(Seq("a" -> 50, "b" -> 40), col("doc_id"))
    }
    intercept[IllegalArgumentException] {
      Pipe(docs).splitByHash(Seq("a" -> 110, "b" -> -10), col("doc_id"))
    }
    intercept[IllegalArgumentException] {
      Pipe(docs.withColumn("split", lit("x")))
        .splitByHash(Seq("a" -> 100), col("doc_id"))
    }
  }
}
