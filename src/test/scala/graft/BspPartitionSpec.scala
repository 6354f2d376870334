package graft

import org.apache.spark.sql.functions._
import graft.spatial.Spatial
import graft.piglatin.PigScript

/** PARTITION ... USING bsp(...) — cost-based binary space partitioning
  * (reference parser/PigParser.scala:1007-1009 -> STARK BSPartitioner).
  */
class BspPartitionSpec extends SparkSpec {
  import spark.implicits._

  test("bspRegions splits a skewed histogram into cost-bounded regions") {
    // a 100-cell strip of cost 1 each + one hot cell of cost 400 at x=200
    val cells = (0L until 100L).map(i => (i, 0L, 1L)).toArray :+
      (200L, 0L, 400L)
    val regions = Spatial.bspRegions(cells, maxCost = 50L)
    // exact partition of the input cell set: disjoint, complete
    val flat = regions.flatten
    assert(flat.length == cells.length)
    assert(flat.map(c => (c._1, c._2)).toSet ==
      cells.map(c => (c._1, c._2)).toSet)
    // every region respects maxCost except the unsplittable hot cell
    val over = regions.filter(_.iterator.map(_._3).sum > 50L)
    assert(over.length == 1 && over.head.toSeq == Seq((200L, 0L, 400L)))
    // the uniform strip splits into >= 2 balanced pieces
    assert(regions.length >= 3)
  }

  test("bspRegions cuts on y when x has a single coordinate") {
    val cells = (0L until 10L).map(i => (5L, i, 10L)).toArray
    val regions = Spatial.bspRegions(cells, maxCost = 30L)
    assert(regions.forall(_.iterator.map(_._3).sum <= 30L))
    assert(regions.length >= 4)
  }

  test("bspPartition bounds per-partition row counts on skewed points") {
    // 9 out of 10 points cluster in [0,3)x[0,3); a uniform unit grid
    // would put ~900 rows in 9 cells while 34 spread cells hold 3 each
    val pts = ((0 until 900).map { i =>
      (i.toLong, (i % 3) + 0.1 + (i % 7) * 0.1, (i / 300) + 0.25)
    } ++ (0 until 100).map { i =>
      (900L + i, 10.0 + (i % 34), 10.0 + (i % 17))
    }).toDF("id", "x", "y")
      .select(col("id"), Spatial.point(col("x"), col("y")).as("pt"))
    val out = Spatial.bspPartition(pts, "pt", sideLength = 1.0,
      maxCost = 150L)
    // identity on content and schema
    assert(out.columns.toSeq == Seq("id", "pt"))
    assert(out.select("id").as[Long].collect().toSet ==
      (0L until 1000L).toSet)
    // physical balance: every partition holds <= maxCost rows (each unit
    // cell here is under maxCost, so no unsplittable hot region exists)
    val sizes = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.sum == 1000)
    assert(sizes.max <= 150, s"partition sizes: ${sizes.toSeq}")
    assert(sizes.count(_ > 0) >= 7, s"partition sizes: ${sizes.toSeq}")
  }

  test("PARTITION ... USING bsp parses named and positional params") {
    val pts = (0 until 200).map(i => (i.toLong, (i % 20).toDouble, (i / 20).toDouble))
      .toDF("id", "x", "y")
      .select(col("id"), Spatial.point(col("x"), col("y")).as("pt"))
    val c = PigScript.run(spark,
      """b = PARTITION a ON pt USING bsp(sideLength=2.0, maxCostPerPartition=60);
        |c = PARTITION a ON pt USING bsp(2.0, 60);""".stripMargin,
      tables = Map("a" -> pts))
    for (alias <- Seq("b", "c")) {
      val out = c.relation(alias)
      assert(out.select("id").as[Long].collect().toSet == (0L until 200L).toSet)
      val sizes = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
      assert(sizes.max <= 60, s"$alias sizes: ${sizes.toSeq}")
    }
  }

  test("PARTITION ... USING grid honours partitionsPerDimension") {
    val pts = (0 until 100).map(i => (i.toLong, (i % 10).toDouble, (i / 10).toDouble))
      .toDF("id", "x", "y")
      .select(col("id"), Spatial.point(col("x"), col("y")).as("pt"))
    val c = PigScript.run(spark,
      "b = PARTITION a ON pt USING grid(partitionsPerDimension=4, withExtent=false);",
      tables = Map("a" -> pts))
    val out = c.relation("b")
    assert(out.rdd.getNumPartitions == 16)
    assert(out.count() == 100)
  }

  test("null-geometry rows go to the overflow partition, not region 0") {
    val rows = (0 until 100).map(i => (i.toLong, Some((i % 10).toDouble))) ++
      (100 until 150).map(i => (i.toLong, Option.empty[Double]))
    val pts = rows.toDF("id", "x")
      .select(col("id"), when(col("x").isNotNull,
        Spatial.point(col("x"), col("x"))).as("pt"))
    val out = Spatial.bspPartition(pts, "pt", sideLength = 1.0, maxCost = 20L)
    val sizes = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.sum == 150)
    // all 50 null rows share the LAST partition; every region partition
    // keeps the cost bound (no cell exceeds 20 here)
    assert(sizes.last == 50, s"sizes: ${sizes.toSeq}")
    assert(sizes.dropRight(1).forall(_ <= 20), s"sizes: ${sizes.toSeq}")
  }

  test("USING INDEX rtree stays an accepted advisory hint; mixed or bad " +
    "params fail fast") {
    val pts = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0)).toDF("id", "x", "y")
      .select(col("id"), Spatial.point(col("x"), col("y")).as("pt"))
    // the pre-method-support grammar forms still run (advisory no-ops)
    val c = PigScript.run(spark,
      """b = PARTITION a ON pt USING INDEX rtree(order=2);
        |c = PARTITION a ON pt USING rtree(order=2);""".stripMargin,
      tables = Map("a" -> pts))
    assert(c.relation("b").count() == 2 && c.relation("c").count() == 2)
    // mixed named+positional would silently shift positional indices
    val e1 = intercept[RuntimeException] {
      PigScript.run(spark, "b = PARTITION a ON pt USING bsp(sideLength=2.0, 60);",
        tables = Map("a" -> pts)).relation("b")
    }
    assert(e1.getMessage.contains("all-named or all-positional"))
    // non-positive / non-numeric grid sizing fails with a pointed message
    val e2 = intercept[RuntimeException] {
      PigScript.run(spark,
        "b = PARTITION a ON pt USING grid(partitionsPerDimension=0);",
        tables = Map("a" -> pts)).relation("b")
    }
    assert(e2.getMessage.contains("must be > 0"))
    val e3 = intercept[RuntimeException] {
      PigScript.run(spark,
        "b = PARTITION a ON pt USING grid(partitionsPerDimension=lots);",
        tables = Map("a" -> pts)).relation("b")
    }
    assert(e3.getMessage.contains("must be numeric"))
  }

  test("unknown PARTITION method fails fast") {
    val pts = Seq((1L, 1.0, 1.0)).toDF("id", "x", "y")
      .select(col("id"), Spatial.point(col("x"), col("y")).as("pt"))
    val err = intercept[RuntimeException] {
      PigScript.run(spark, "b = PARTITION a ON pt USING quadtree(3);",
        tables = Map("a" -> pts)).relation("b")
    }
    assert(err.getMessage.contains("unsupported PARTITION method"))
  }
}
