package graft

import org.apache.spark.sql.functions._
import graft.core.Pipe

/** Differential testing for the remaining driver-offset and dominance
  * operators: rankByKeys (Pig RANK ties share a rank computed over
  * distinct keys + per-partition prefix offsets), zipWithIndex /
  * zipWith (monotonic ids + collected partition offsets), skyline
  * (partition-local Pareto + merge), and bruteForceTopK cosine — each
  * against a plain-Scala model on seeded random data, across several
  * partitionings so partition-boundary bookkeeping is exercised. */
class RankZipSkylineDifferentialSpec extends SparkSpec {
  import spark.implicits._

  test("rankByKeys equals the dense Pig rank model (ties, asc/desc)") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(820 + seed)
      // few distinct key values -> heavy ties
      val rows = (1 to 90).map(i =>
        (i.toLong, rnd.nextInt(5), rnd.nextInt(4)))
      val desc1 = seed % 2 == 0
      val df = rows.toDF("id", "a", "b").repartition(1 + seed)
      val got = Pipe(df).rankByKeys(
          Seq((col("a"), desc1), (col("b"), false)), "rank")
        .df.select("id", "rank").as[(Long, Long)].collect().toMap

      // Pig RANK: rank = 1 + count of rows with strictly-preceding keys
      val keyOf = rows.map(r => r._1 -> (r._2, r._3)).toMap
      implicit val ord: Ordering[(Int, Int)] = Ordering.Tuple2(
        if (desc1) Ordering.Int.reverse else Ordering.Int, Ordering.Int)
      val model = rows.map { case (id, a, b) =>
        id -> (1L + rows.count(r => ord.lt((r._2, r._3), (a, b))))
      }.toMap
      assert(got == model, s"seed=$seed desc=$desc1 " +
        s"diff=${(got.toSet -- model.toSet).take(4)}")
    }
  }

  test("zipWithIndex assigns exactly 0..n-1 in order, any partitioning") {
    for (parts <- Seq(1, 3, 7)) {
      val rnd = new scala.util.Random(parts)
      val rows = rnd.shuffle((1 to 75).toList).map(i => (i.toLong, i * 2))
      val df = rows.toDF("id", "v").repartition(parts)
      val got = Pipe(df).zipWithIndex(Seq(col("id").asc), "idx")
        .df.select("id", "idx").as[(Long, Long)].collect().toMap
      val model = rows.map(_._1).sorted.zipWithIndex
        .map { case (id, i) => id -> i.toLong }.toMap
      assert(got == model, s"parts=$parts")
    }
  }

  test("zipWith pairs by position and truncates to the shorter side") {
    val l = (1 to 20).map(i => (i.toLong, s"L$i")).toDF("k", "v").repartition(4)
    val r = (1 to 13).map(i => (100L - i, s"R$i")).toDF("k", "v").repartition(3)
    val got = Pipe(l).zipWith(Pipe(r), Seq(col("k").asc), Seq(col("k").desc))
      .df.select("v", "v_r").as[(String, String)].collect().toSet
    // left ascending by k pairs with right DESCENDING by k: position i
    // joins L(i+1) with R(i+1) (right's desc order is R1, R2, ... by k)
    val model = (1 to 13).map(i => (s"L$i", s"R$i")).toSet
    assert(got == model)
  }

  test("skyline equals the brute-force Pareto model on random points") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(840 + seed)
      val rows = (1 to 80).map(i =>
        (i.toLong, rnd.nextInt(10).toDouble, rnd.nextInt(10).toDouble,
          rnd.nextInt(10).toDouble))
      val maxZ = seed % 2 == 0
      val df = rows.toDF("id", "x", "y", "z").repartition(2 + seed)
      val got = Pipe(df).skyline(Seq("x", "y", "z"),
          maximize = if (maxZ) Set("z") else Set.empty)
        .df.select("id").as[Long].collect().toSet
      def better(p: (Double, Double, Double), q: (Double, Double, Double)) = {
        // p dominates q: <= on minimized dims (>= on maximized), < somewhere
        val zOk = if (maxZ) p._3 >= q._3 else p._3 <= q._3
        val allOk = p._1 <= q._1 && p._2 <= q._2 && zOk
        val strict = p._1 < q._1 || p._2 < q._2 ||
          (if (maxZ) p._3 > q._3 else p._3 < q._3)
        allOk && strict
      }
      val model = rows.filter { q =>
        !rows.exists(p => better((p._2, p._3, p._4), (q._2, q._3, q._4)))
      }.map(_._1).toSet
      assert(got == model, s"seed=$seed maxZ=$maxZ " +
        s"missing=${(model -- got).take(3)} extra=${(got -- model).take(3)}")
    }
  }

  test("bruteForceTopK equals the plain-Scala cosine model") {
    val rnd = new scala.util.Random(99)
    val dim = 8
    def vec() = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    val corpus = (1 to 60).map(i => (i.toLong, vec()))
    val queries = (1 to 5).map(i => (100L + i, vec()))
    val cDf = corpus.toDF("id", "vec").repartition(4)
    val qDf = queries.toDF("qid", "vec")
    val k = 7
    val got = graft.sim.Similarity.bruteForceTopK(cDf, qDf, k)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    queries.foreach { case (qid, qv) =>
      val model = corpus.map { case (id, cv) => (id, cos(cv, qv)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
      assert(got(qid) == model, s"qid=$qid got=${got(qid)} want=$model")
    }
  }
}
