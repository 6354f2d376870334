package graft

import org.apache.spark.sql.functions._
import graft.core.HeavyHitters

/** Heavy hitters (core/HeavyHitters.scala): exact-vs-sketch agreement,
  * the Misra–Gries error contract, and the shuffle-size plan contract
  * that justifies the sketch regime. */
class HeavyHittersSpec extends SparkSpec {

  private def toks = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(explode(filter(split(col("text"), "\\s+"),
      tk => tk =!= "")).as("tok"))

  test("exact: matches a direct group-count with deterministic tie-break") {
    val got = HeavyHitters.exact(toks, col("tok"), 10).collect()
    val want = toks.groupBy("tok").count()
      .orderBy(col("count").desc, col("tok").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq === want.toSeq)
  }

  test("sketch at ample capacity is exact: est_min == est_max == true count") {
    val sk = HeavyHitters.sketch(toks, col("tok"), 10, capacity = 1 << 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ex = HeavyHitters.exact(toks, col("tok"), 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sk.map(t => (t._1, t._2)).toSeq === ex.toSeq)
    sk.foreach { case (_, lo, hi) => assert(lo === hi) } // zero decrements
  }

  test("MG contract under pressure: bounds bracket truth; loud values surface") {
    import spark.implicits._
    // zipfian-ish: value v appears ~N/v times, shuffled across partitions
    val n = 200
    val data = (1 to n).flatMap(v => Seq.fill(1 + 2 * (n / v))(s"v$v"))
    val df = spark.createDataset(scala.util.Random.shuffle(data))
      .repartition(8).toDF("v")
    val truth = data.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val sk = HeavyHitters.sketch(df, col("v"), 10, capacity = 32)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    sk.foreach { case (v, lo, hi) =>
      assert(lo <= truth(v) && truth(v) <= hi,
        s"$v: true ${truth(v)} outside [$lo,$hi]")
    }
    // guarantee: frequency > n_total/(capacity+1) per partition sum ⇒
    // the dominant values cannot be evicted everywhere — v1..v3 surface
    val surfaced = sk.map(_._1).toSet
    assert(Seq("v1", "v2", "v3").forall(surfaced.contains), s"got $surfaced")
  }

  test("plan contract: sketch's exchange carries summaries, not occurrences") {
    val plan = HeavyHitters.sketch(toks, col("tok"), 10)
      .queryExecution.executedPlan.toString
    // the MG mapPartitions runs BEFORE the first exchange: the plan
    // must show the DeserializeToObject/MapPartitions pipeline feeding
    // the aggregate, not an exchange feeding the map
    assert(plan.contains("MapPartitions"),
      "sketch must reduce per-partition before shuffling")
    val ex = HeavyHitters.exact(toks, col("tok"), 10)
      .queryExecution.executedPlan.toString
    assert(ex.contains("TakeOrderedAndProject"),
      "exact top-k must be TakeOrdered, never a global sort")
  }

  test("capacity < k fails fast") {
    intercept[IllegalArgumentException] {
      HeavyHitters.sketch(toks, col("tok"), 100, capacity = 10)
    }
  }
}
