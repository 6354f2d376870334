package graft

import org.apache.spark.sql.functions._
import graft.spatial.Spatial
import graft.piglatin.PigScript

/** The Z-order curve spatial index (`INDEX ... USING rtree` analog):
  * Morton codes vs a plain-Scala model, the range-partitioning
  * invariant (partitions hold disjoint contiguous code ranges — R-tree
  * leaf pages), quadrant locality, and the dialect routing. */
class ZOrderIndexSpec extends SparkSpec {
  import spark.implicits._

  private def modelMorton(x: Double, y: Double, lo: (Double, Double),
                          hi: (Double, Double), bits: Int): Long = {
    val scaleMax = (1L << bits) - 1
    def quant(c: Double, l: Double, h: Double): Long = {
      val span = math.max(h - l, java.lang.Double.MIN_NORMAL)
      math.min(scaleMax, math.max(0L,
        math.floor((c - l) / span * scaleMax).toLong))
    }
    val (qx, qy) = (quant(x, lo._1, hi._1), quant(y, lo._2, hi._2))
    (0 until bits).map { i =>
      ((qx >> i) & 1L) * (1L << (2 * i)) + ((qy >> i) & 1L) * (1L << (2 * i + 1))
    }.sum
  }

  test("zorder codes equal the plain-Scala Morton model") {
    val rnd = new scala.util.Random(31)
    val pts = (1 to 80).map(i =>
      (i.toLong, rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 6))
    val df = pts.toDF("id", "x", "y")
      .select(col("id"), Spatial.point(col("x"), col("y")).as("pt"))
    val got = Spatial.zOrderIndex(df, "pt", partitions = 4, bits = 10)
      .select("id", "zorder").as[(Long, Long)].collect().toMap
    val lo = (pts.map(_._2).min, pts.map(_._3).min)
    val hi = (pts.map(_._2).max, pts.map(_._3).max)
    pts.foreach { case (id, x, y) =>
      assert(got(id) == modelMorton(x, y, lo, hi, 10), s"id=$id")
    }
  }

  test("partitions hold disjoint contiguous zorder ranges (leaf pages)") {
    val rnd = new scala.util.Random(37)
    val pts = (1 to 200).map(i =>
      (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val df = pts.toDF("id", "x", "y")
      .select(col("id"), Spatial.point(col("x"), col("y")).as("pt"))
    val ranges = Spatial.zOrderIndex(df, "pt", partitions = 5)
      .select(spark_partition_id().as("p"), col("zorder"))
      .groupBy("p").agg(min("zorder").as("lo"), max("zorder").as("hi"),
        count(lit(1)).as("n"))
      .orderBy("p").as[(Int, Long, Long, Long)].collect()
    assert(ranges.map(_._4).sum == 200)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2,
        s"overlapping ranges: $a vs $b")
      case _ =>
    }
  }

  test("quadrant clusters stay spatially local across partitions") {
    val rnd = new scala.util.Random(41)
    // four tight clusters, one per quadrant of [0,100]^2
    val centers = Seq((20.0, 20.0), (80.0, 20.0), (20.0, 80.0), (80.0, 80.0))
    val pts = centers.zipWithIndex.flatMap { case ((cx, cy), q) =>
      (1 to 50).map(i => (q * 1000L + i, cx + rnd.nextGaussian() * 3,
        cy + rnd.nextGaussian() * 3))
    }
    val df = pts.toDF("id", "x", "y")
      .select(col("id"), Spatial.point(col("x"), col("y")).as("pt"))
    val byQuadrant = Spatial.zOrderIndex(df, "pt", partitions = 4)
      .select((col("id") / 1000).cast("int").as("q"),
        spark_partition_id().as("p"))
      .as[(Int, Int)].collect().groupBy(_._1)
    // Z-order makes each quadrant a contiguous code block: a 4-way range
    // split can cut a cluster at most once
    byQuadrant.foreach { case (q, rows) =>
      assert(rows.map(_._2).distinct.size <= 2,
        s"quadrant $q scattered over ${rows.map(_._2).distinct.toSeq}")
    }
  }

  test("null and NaN points survive in the nulls partition") {
    val df = Seq((1L, Some(1.0), Some(2.0)), (2L, None, None),
        (3L, Some(Double.NaN), Some(1.0)))
      .toDF("id", "x", "y")
      .select(col("id"), when(col("x").isNotNull,
        Spatial.point(col("x"), col("y"))).as("pt"))
    val got = Spatial.zOrderIndex(df, "pt", partitions = 3)
      .select("id", "zorder").as[(Long, Option[Long])].collect().toMap
    assert(got.size == 3 && got(1L).isDefined &&
      got(2L).isEmpty && got(3L).isEmpty)
  }

  test("one NaN or Infinity row neither crashes the build nor poisons " +
      "the bounds of clean rows") {
    val df = Seq((1L, 0.0, 0.0), (2L, 10.0, 10.0), (3L, Double.NaN, 5.0),
        (4L, Double.PositiveInfinity, 5.0), (5L, 5.0, Double.NegativeInfinity))
      .toDF("id", "x", "y")
      .select(col("id"), Spatial.point(col("x"), col("y")).as("pt"))
    val got = Spatial.zOrderIndex(df, "pt", partitions = 2, bits = 10)
      .select("id", "zorder").as[(Long, Option[Long])].collect().toMap
    assert(got.size == 5)
    assert(got(3L).isEmpty && got(4L).isEmpty && got(5L).isEmpty)
    // bounds come from the FINITE rows only: (0,0) and (10,10) map to the
    // quantization extremes, exactly as if the dirty rows were absent
    assert(got(1L).contains(0L))
    assert(got(2L).contains(modelMorton(10, 10, (0.0, 0.0), (10.0, 10.0), 10)))
  }

  test("re-indexing an indexed relation replaces the index column") {
    val df = Seq((1L, 1.0, 2.0), (2L, 3.0, 4.0)).toDF("id", "x", "y")
      .select(col("id"), Spatial.point(col("x"), col("y")).as("pt"))
    val once = Spatial.zOrderIndex(df, "pt", partitions = 2)
    val twice = Spatial.zOrderIndex(once, "pt", partitions = 2)
    assert(twice.columns.count(_ == "zorder") == 1 && twice.count() == 2)
    val gridTwice = Spatial.spatialIndex(
      Spatial.spatialIndex(df, "pt", 1.0, 2), "pt", 2.0, 2)
    assert(gridTwice.columns.count(_ == "cell") == 1 && gridTwice.count() == 2)
  }

  test("grid spatialIndex gives dirty points a null cell instead of an " +
      "ANSI cast crash; bspPartition routes them to overflow") {
    val df = Seq((1L, 1.0, 1.0), (2L, Double.NaN, 1.0),
        (3L, Double.PositiveInfinity, 2.0))
      .toDF("id", "x", "y")
      .select(col("id"), Spatial.point(col("x"), col("y")).as("pt"))
    val cells = Spatial.spatialIndex(df, "pt", 1.0, 2)
      .select("id", "cell").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(cells == Map(1L -> false, 2L -> true, 3L -> true))
    val placed = Spatial.bspPartition(df, "pt", sideLength = 1.0, maxCost = 10)
    assert(placed.count() == 3) // dirty rows survive in the overflow part
    // distance join simply excludes them
    val j = Spatial.distanceJoin(df, df.withColumnRenamed("pt", "p2")
      .withColumnRenamed("id", "id2"), "pt", "p2", 1.0)
    assert(j.select("id").as[Long].collect().toSet == Set(1L))
  }

  test("dialect: INDEX USING rtree takes the Z-order path, grid keeps cells") {
    val df = Seq((1.0, 2.0), (3.0, 4.0), (50.0, 60.0)).toDF("x", "y")
      .select(Spatial.point(col("x"), col("y")).as("loc"))
    val r = PigScript.run(spark,
      """b = index a on loc using rtree(order=2);
        |c = index a on loc using grid(cellSize=1);
        |""".stripMargin, tables = Map("a" -> df))
    assert(r.relation("b").columns.contains("zorder"))
    assert(r.relation("c").columns.contains("cell"))
    assert(r.relation("b").count() == 3 && r.relation("c").count() == 3)
  }
}
