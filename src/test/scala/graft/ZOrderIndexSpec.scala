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
