package graft

import org.apache.spark.sql.functions._
import graft.sim.{Pq, Similarity}

/** Product quantization: encode/ADC semantics, and a differential check
  * of the whole engine path (encode → ADC → rank; IVF-PQ cell
  * restriction) against an independent plain-Scala model — exact
  * equality, since every float op is a sequential ascending fold on both
  * sides. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 8
  private val k = 8
  private val rnd = new scala.util.Random(7L)
  // two loose clusters so ANN recall is meaningful
  private def vec(center: Double) =
    Array.fill(dim)(center + rnd.nextGaussian() * 0.3)
  private val corpusRows: Seq[(Long, Array[Double])] =
    (0L until 80L).map(i => (i, vec(if (i % 2 == 0) 1.0 else -1.0)))
  private val queryRows: Seq[(Long, Array[Double])] =
    (100L until 104L).map(i => (i, vec(if (i % 2 == 0) 1.0 else -1.0)))

  private def corpusDf = corpusRows.toDF("id", "vec")
  private def queryDf = queryRows.toDF("qid", "vec")
  private lazy val codebooks =
    Pq.trainCodebooks(corpusDf, m = m, k = k, sampleSize = 512)

  // ---- plain-Scala model (independent of the Column expressions) ----------
  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }
  private def modelCodes(v: Array[Double]): Array[Int] =
    (0 until m).map { i =>
      val sub = v.slice(i * (dim / m), (i + 1) * (dim / m))
      codebooks(i).zipWithIndex
        .map { case (c, ci) => (l2sq(sub, c), ci) }.minBy(identity)._2
    }.toArray
  private def modelAdist(q: Array[Double], codes: Array[Int]): Double = {
    var s = 0.0
    for (i <- 0 until m) {
      val sub = q.slice(i * (dim / m), (i + 1) * (dim / m))
      s += l2sq(sub, codebooks(i)(codes(i)))
    }
    s
  }

  test("codes have m entries, each a valid centroid id") {
    val codes = Pq.encode(corpusDf, codebooks).collect()
    assert(codes.length == corpusRows.size)
    codes.foreach { r =>
      val c = r.getSeq[Int](1)
      assert(c.length == m && c.forall(x => x >= 0 && x < k))
    }
  }

  test("engine codes equal the model argmin (min-index ties)") {
    val got = Pq.encode(corpusDf, codebooks).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    corpusRows.foreach { case (id, v) =>
      assert(got(id).sameElements(modelCodes(v)), s"codes differ for $id")
    }
  }

  test("adcTopK ranking equals the model exactly") {
    val got = Pq.adcTopK(corpusDf, queryDf, k = 10, codebooks)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    val codes = corpusRows.map { case (id, v) => (id, modelCodes(v)) }
    val want = queryRows.flatMap { case (qid, q) =>
      codes.map { case (id, c) => (modelAdist(q, c), id) }
        .sorted.take(10).zipWithIndex
        .map { case ((_, id), r) => (qid, id, r + 1) }
    }.toSet
    assert(got == want)
  }

  test("exact duplicate vectors share codes and tie by id") {
    val dup = corpusDf.union(
      corpusDf.where(col("id") === 0L)
        .select((col("id") + 1000L).as("id"), col("vec")))
    val codes = Pq.encode(dup, codebooks).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) == codes(1000L))
  }

  test("ADC recall vs exact L2 is high on clustered data") {
    val exact = queryRows.flatMap { case (qid, q) =>
      corpusRows.map { case (id, v) => (l2sq(q, v), id) }
        .sorted.take(10).map { case (_, id) => (qid, id) }
    }.toSet
    val approx = Pq.adcTopK(corpusDf, queryDf, k = 10, codebooks)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"ADC recall $recall too low")
  }

  test("ivfPqTopK equals ADC restricted to the probed cells (model)") {
    val coarse = Similarity.ivfCentroids(corpusDf, nCells = 4,
      sampleSize = 512)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // probeCells rule: sort (-dot, idx) ascending, take first n idxs
    def cells(v: Array[Double], n: Int): Seq[Int] =
      coarse.zipWithIndex.map { case (c, i) => (-dot(v, c), i) }
        .sorted.take(n).map(_._2)
    val codes = corpusRows.map { case (id, v) =>
      (id, cells(v, 1).head, modelCodes(v)) }
    val want = queryRows.flatMap { case (qid, q) =>
      val probed = cells(q, 2).toSet
      codes.filter(c => probed(c._2))
        .map { case (id, _, c) => (modelAdist(q, c), id) }
        .sorted.take(5).zipWithIndex
        .map { case ((_, id), r) => (qid, id, r + 1) }
    }.toSet
    val got = Pq.ivfPqTopK(corpusDf, queryDf, k = 5, coarse, codebooks,
        nProbe = 2)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("dim not divisible by m fails fast") {
    val err = intercept[IllegalArgumentException] {
      Pq.trainCodebooks(corpusDf, m = 5, k = k, sampleSize = 512)
    }
    assert(err.getMessage.contains("not divisible"))
  }

  test("ivfPqResidualTopK equals the residual model exactly, and residual " +
      "encoding does not lose recall vs raw-vector codes") {
    val coarse = Similarity.ivfCentroids(corpusDf, nCells = 4,
      sampleSize = 512)
    val rcb = Pq.residualCodebooks(corpusDf, coarse, m = m, k = k,
      sampleSize = 512)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def cells(v: Array[Double], n: Int): Seq[Int] =
      coarse.zipWithIndex.map { case (c, i) => (-dot(v, c), i) }
        .sorted.take(n).map(_._2)
    def sub(a: Array[Double], b: Array[Double]): Array[Double] =
      Array.tabulate(a.length)(i => a(i) - b(i))
    def rCodes(v: Array[Double]): Array[Int] = {
      val r = sub(v, coarse(cells(v, 1).head))
      (0 until m).map { i =>
        val s = r.slice(i * (dim / m), (i + 1) * (dim / m))
        rcb(i).zipWithIndex.map { case (c, ci) => (l2sq(s, c), ci) }
          .minBy(identity)._2
      }.toArray
    }
    def rAdist(q: Array[Double], cell: Int, codes: Array[Int]): Double = {
      val qr = sub(q, coarse(cell))
      var s = 0.0
      for (i <- 0 until m)
        s += l2sq(qr.slice(i * (dim / m), (i + 1) * (dim / m)),
          rcb(i)(codes(i)))
      s
    }
    val nProbe = 2
    val codes = corpusRows.map { case (id, v) =>
      (id, cells(v, 1).head, rCodes(v)) }
    val want = queryRows.flatMap { case (qid, q) =>
      cells(q, nProbe).flatMap(cell =>
          codes.filter(_._2 == cell)
            .map { case (id, _, c) => (rAdist(q, cell, c), id) })
        .sorted.take(5).zipWithIndex
        .map { case ((_, id), r) => (qid, id, r + 1) }
    }.toSet
    val got = Pq.ivfPqResidualTopK(corpusDf, queryDf, k = 5, coarse, rcb,
        nProbe = nProbe)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got == want)

    // recall vs exact L2 within the probed cells: residual codes should
    // not be worse than raw-vector codes on this clustered data
    val exact = queryRows.flatMap { case (qid, q) =>
      corpusRows.map { case (id, v) => (l2sq(q, v), id) }
        .sorted.take(5).map { case (_, id) => (qid, id) }
    }.toSet
    val plain = Pq.ivfPqTopK(corpusDf, queryDf, k = 5, coarse, codebooks,
        nProbe = nProbe)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val res = got.map { case (qid, id, _) => (qid, id) }
    val recallPlain = (exact & plain).size.toDouble / exact.size
    val recallRes = (exact & res).size.toDouble / exact.size
    assert(recallRes >= recallPlain,
      s"residual recall $recallRes < raw-code recall $recallPlain")
  }
}
