package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Differential testing for the AllPairs prefix-filtered set-similarity
  * join: ngramJaccard vs the brute-force all-pairs Jaccard over the SAME
  * hashed shingle sets (shingling itself is shared ground truth, so any
  * divergence is the prefix filter / candidate join / refine — the
  * lossless-lemma machinery). Corpora are mutation clusters of base
  * documents, so pair similarities straddle the threshold from both
  * sides; maxDocFreq is left above the corpus size so the documented
  * df-cap caveat cannot bind and losslessness must be exact. */
class JaccardDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  private def mutate(base: Vector[String], rnd: scala.util.Random,
                     rate: Double): Vector[String] =
    base.flatMap { w =>
      val r = rnd.nextDouble()
      if (r < rate / 3) Vector.empty // drop
      else if (r < 2 * rate / 3) Vector(vocab(rnd.nextInt(vocab.size))) // swap
      else if (r < rate) Vector(w, vocab(rnd.nextInt(vocab.size))) // insert
      else Vector(w)
    }

  test("ngramJaccard equals brute-force all-pairs on mutation clusters") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(600 + seed)
      val docs = (0 until 12).flatMap { c =>
        val base = Vector.fill(14 + rnd.nextInt(10))(
          vocab(rnd.nextInt(vocab.size)))
        (0 until 4).map { v =>
          val rate = Seq(0.0, 0.1, 0.3, 0.8)(v)
          ((c * 10 + v).toLong, mutate(base, rnd, rate).mkString(" "))
        }
      } :+ (990L, "") :+ (991L, "ab") // empty + shorter-than-n docs
      val df = docs.toDF("id", "text").repartition(5)
      val n = 2 + seed % 2
      val threshold = Seq(0.5, 0.6, 0.75, 0.9)(seed % 4)

      // ground-truth shingle sets from the same expression
      val sets = Dedup.hashedShingleDF(df, "id", "text", n)
        .select(col("id"), col("sh"))
        .as[(Long, Seq[Long])].collect().toMap.view.mapValues(_.toSet).toMap
      val model = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
        inter = (sa & sb).size
        uni = (sa | sb).size
        if inter > 0 && uni > 0 && inter.toDouble / uni >= threshold
      } yield (a, b)).toSet

      val got = Dedup.ngramJaccard(df, "id", "text", n, threshold,
          maxDocFreq = 10000)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == model, s"seed=$seed n=$n t=$threshold " +
        s"missing=${(model -- got).take(4)} extra=${(got -- model).take(4)}")
    }
  }

  test("minhashLsh refine never reports a pair below the exact threshold " +
      "and finds every identical-text pair") {
    val rnd = new scala.util.Random(55)
    val shared = Vector.fill(18)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (0 until 30).map { i =>
      val base = Vector.fill(20)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, (if (i % 3 == 0) base // identical triplets per base
                  else mutate(base, rnd, 0.5)).mkString(" "))
    } ++ (0 until 10).map(i => (100L + i, shared)) // exact duplicates
    val df = docs.toDF("id", "text")
    val threshold = 0.7
    val got = Dedup.minhashLsh(df, "id", "text", numHashes = 32, bands = 16,
        threshold = threshold, shingleN = 3)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    val sets = Dedup.hashedShingleDF(df, "id", "text", 3)
      .select(col("id"), col("sh"))
      .as[(Long, Seq[Long])].collect().toMap.view.mapValues(_.toSet).toMap
    // no false positives past the refine
    got.foreach { case (a, b, j) =>
      val inter = (sets(a) & sets(b)).size
      val uni = (sets(a) | sets(b)).size
      val exact = if (uni == 0) 0.0 else inter.toDouble / uni
      assert(math.abs(exact - j) < 1e-12 && exact >= threshold,
        s"pair ($a,$b) reported j=$j exact=$exact")
    }
    // identical shingle sets collide in every band — recall 1 for them
    val reported = got.map(p => (p._1, p._2)).toSet
    for ((a, sa) <- sets; (b, sb) <- sets
         if a < b && sa == sb && sa.nonEmpty)
      assert(reported((a, b)), s"identical pair ($a,$b) missed")
  }
}
