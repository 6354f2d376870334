package graft

import org.apache.spark.sql.functions._
import graft.core.{Overlap, Pipe}

class OverlapSpec extends SparkSpec {
  import spark.implicits._

  test("exact overlap matches set arithmetic, nulls and dups ignored") {
    val a = (Seq.fill(3)(1L) ++ (1L to 100L))
      .map(v => Tuple1(java.lang.Long.valueOf(v)))
      .:+(Tuple1(null.asInstanceOf[java.lang.Long])).toDF("k")
    val b = ((51L to 150L) ++ Seq.fill(5)(60L)).map(Tuple1(_)).toDF("k")
    val r = Overlap.exact(a, col("k"), b, col("k")).head()
    assert(r.getAs[Long]("n_a") == 100L)
    assert(r.getAs[Long]("n_b") == 100L)
    assert(r.getAs[Long]("n_common") == 50L)
    assert(math.abs(r.getAs[Double]("jaccard") - 50.0 / 150.0) < 1e-12)
  }

  test("sketch overlap lands within HLL tolerance of exact") {
    val a = (1L to 20000L).map(Tuple1(_)).toDF("k")
    val b = (10001L to 30000L).map(Tuple1(_)).toDF("k")
    val ex = Overlap.exact(a, col("k"), b, col("k")).head()
    val sk = Overlap.sketch(a, col("k"), b, col("k"), lgK = 12).head()
    def within(est: Long, truth: Long, tol: Double) =
      math.abs(est - truth) <= truth * tol
    assert(within(sk.getAs[Long]("n_a"), ex.getAs[Long]("n_a"), 0.05),
      s"n_a: ${sk.getAs[Long]("n_a")} vs ${ex.getAs[Long]("n_a")}")
    assert(within(sk.getAs[Long]("n_b"), ex.getAs[Long]("n_b"), 0.05))
    // intersection by inclusion–exclusion compounds error — wider band
    assert(within(sk.getAs[Long]("n_common"),
      ex.getAs[Long]("n_common"), 0.15),
      s"n_common: ${sk.getAs[Long]("n_common")} vs " +
        ex.getAs[Long]("n_common"))
  }

  test("sketch plan has no join and no distinct aggregation state") {
    val a = (1L to 100L).map(Tuple1(_)).toDF("k")
    val plan = Overlap.sketch(a, col("k"), a, col("k"))
      .queryExecution.executedPlan.toString
    // the only joins are the 1-row stat-frame crosses; no equi-join of
    // key sets, no HashAggregate keyed on k
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan.take(2000))
    assert(!plan.contains("Exchange hashpartitioning(k"), plan.take(2000))
  }

  test("disjoint and identical corpora hit the boundaries") {
    val a = (1L to 500L).map(Tuple1(_)).toDF("k")
    val b = (1001L to 1500L).map(Tuple1(_)).toDF("k")
    val dis = Overlap.exact(a, col("k"), b, col("k")).head()
    assert(dis.getAs[Long]("n_common") == 0L &&
      dis.getAs[Double]("jaccard") == 0.0)
    val same = Overlap.exact(a, col("k"), a, col("k")).head()
    assert(same.getAs[Long]("n_common") == 500L &&
      same.getAs[Double]("jaccard") == 1.0)
  }

  test("diff classifies added/removed/changed; unchanged rows vanish") {
    val a = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("id", "c")
    val b = Seq((1L, "one"), (2L, "TWO!"), (4L, "four"), (9L, "nine"))
      .toDF("id", "c")
    val d = Overlap.diff(a, col("id"), col("c"), b, col("id"), col("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 9L -> "added"),
      d.toString)
    // identical versions diff to nothing
    assert(Overlap.diff(a, col("id"), col("c"), a, col("id"), col("c"))
      .count() == 0L)
  }

  test("madOutliers flags exactly the |x-med| > k*MAD rows; constant " +
      "group flags nothing") {
    // group g: values 1..9 plus a 100 spike → med 5, deviations
    // {4,3,2,1,0,1,2,3,4,95} → MAD 2.5; k=3 → threshold 7.5 → only 100
    val df = ((1 to 9).map(i => ("g", i.toLong)) :+ ("g", 100L))
      .toDF("grp", "x")
    val out = Pipe(df).madOutliers(col("grp"), col("x"), 3.0).df
    val flagged = out.where(col("is_outlier")).select("x")
      .as[Long].collect().toSeq
    assert(flagged == Seq(100L), flagged.toString)
    assert(out.count() == 10L, "all rows pass through with the flag")
    // constant group: MAD 0, no deviation — nothing flagged
    val const = Seq.fill(8)(("c", 7L)).toDF("grp", "x")
    assert(Pipe(const).madOutliers(col("grp"), col("x"), 3.0)
      .df.where(col("is_outlier")).count() == 0L)
    // but any deviation from a constant group IS flagged (MAD 0)
    val spike = (Seq.fill(8)(("c", 7L)) :+ ("c", 8L)).toDF("grp", "x")
    assert(Pipe(spike).madOutliers(col("grp"), col("x"), 3.0)
      .df.where(col("is_outlier")).select("x").as[Long].collect()
      .toSeq == Seq(8L))
  }
}
