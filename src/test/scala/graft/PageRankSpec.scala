package graft

import org.apache.spark.sql.functions._
import graft.graph.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory model of the exact fixed-point recurrence. */
  private def model(edges: Seq[(Long, Long)], iters: Int,
                    scale: Long = 1000000000L): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val base = scale * 15L / 100L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(n => n -> (base + 85L * contrib.getOrElse(n, 0L) / 100L))
        .toMap
    }
    r
  }

  private val g = Seq( // two hubs, one dangling sink, a self-loop
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (5L, 5L), (2L, 6L))

  test("matches the in-memory fixed-point model exactly, several depths") {
    for (iters <- Seq(0, 1, 3, 10)) {
      val got = PageRank.pageRank(g.toDF("src", "dst"),
          col("src"), col("dst"), iterations = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model(g, iters), s"iters=$iters")
      graft.core.Intermediates.release()
    }
  }

  test("rank ordering matches the analytic fixed point") {
    val got = PageRank.pageRank(g.toDF("src", "dst"),
        col("src"), col("dst"), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // analytic steady state: 5 (self-loop retains all mass) > 1 (gets
    // ALL of 3's mass — 3→1 is 3's only out-edge) > 3 (three in-edges
    // at half/half/full weight) > 2 > 6 > 4 (no in-edges: base only)
    val order = Seq(5L, 1L, 3L, 2L, 6L, 4L)
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(got(a) > got(b), s"expected r($a) > r($b) in $got") }
    // no-in-edge node sits exactly at the base term
    assert(got(4L) == 150000000L)
    graft.core.Intermediates.release()
  }

  test("deterministic under repartitioning (integer arithmetic is " +
       "order-independent)") {
    val base = PageRank.pageRank(g.toDF("src", "dst"),
        col("src"), col("dst"), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.Intermediates.release()
    val shuffled = PageRank.pageRank(
        g.reverse.toDF("src", "dst").repartition(7),
        col("src"), col("dst"), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base == shuffled)
    graft.core.Intermediates.release()
  }
}
