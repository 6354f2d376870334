package graft

import org.apache.spark.sql.functions._
import graft.core.Pipe
import graft.plans.TopK

/** The custom partial/final top-k-per-group operator (tier (c) extension:
  * LogicalPlan + Strategy + SparkPlan). */
class TopKSpec extends SparkSpec {

  private def orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("custom top-k matches the window formulation exactly") {
    val expected = Pipe(orders).topPerGroup(3,
        Seq(col("o_orderpriority")),
        Seq(col("o_totalprice").desc, col("o_orderkey")))
      .df.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val got = TopK.topKPerGroup(orders,
        Seq(col("o_orderpriority")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("physical plan is partial -> exchange -> final (map-side prune)") {
    val df = TopK.topKPerGroup(orders, Seq(col("o_orderpriority")),
      Seq(col("o_totalprice").desc), k = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPartial"), plan)
    assert(plan.contains("TopKFinal"), plan)
    // the exchange must sit BETWEEN final and partial: partial runs map-side
    val finalIdx = plan.indexOf("TopKFinal")
    val exIdx = plan.indexOf("Exchange", finalIdx)
    val partialIdx = plan.indexOf("TopKPartial ", finalIdx)
    assert(exIdx >= 0 && exIdx < partialIdx, plan)
  }

  test("duplicate order keys keep exactly k rows per group") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 2)).toDF("g", "v")
    val got = TopK.topKPerGroup(df, Seq(col("g")), Seq(col("v").asc), k = 2)
    assert(got.where(col("g") === "a").count() == 2)
    assert(got.where(col("g") === "b").count() == 1)
  }
}
