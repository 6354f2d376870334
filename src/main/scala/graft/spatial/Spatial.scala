package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spatial operators (reference: src/main/scala/dbis/piglet/op/
  * SpatialFilter.scala, SpatialJoin.scala, IndexOp.scala + the
  * dbis-ilm/stark backend it delegates to).
  *
  * graft's geometry model: points as (x, y) doubles; boxes as
  * (xmin, ymin, xmax, ymax); WKT POINT parsing for loaders. Predicates
  * are pure column arithmetic (codegen'd); the join is grid-bucketed —
  * cell id equi-join + exact refine — so the shuffle is on cell keys, the
  * standard distributed spatial-join shape (no R-tree needed at the
  * logical level; AQE balances hot cells).
  */
object Spatial {

  /** Parse 'POINT (x y)' WKT into a (x, y) struct. */
  def wktPoint(wkt: Column): Column = {
    val nums = regexp_extract_all(wkt,
      lit("""-?\d+(?:\.\d+)?(?:[eE]-?\d+)?"""), lit(0))
    struct(element_at(nums, 1).cast(DoubleType).as("x"),
           element_at(nums, 2).cast(DoubleType).as("y"))
  }

  def point(x: Column, y: Column): Column =
    struct(x.cast(DoubleType).as("x"), y.cast(DoubleType).as("y"))

  // ---- predicates (SPATIAL_FILTER: containedBy / contains / intersects) ----
  /** Point within axis-aligned box (containedBy). */
  def inBox(pt: Column, xmin: Double, ymin: Double,
            xmax: Double, ymax: Double): Column =
    pt.getField("x") >= xmin && pt.getField("x") <= xmax &&
    pt.getField("y") >= ymin && pt.getField("y") <= ymax

  /** Euclidean distance between two points. */
  def dist(a: Column, b: Column): Column =
    sqrt(pow(a.getField("x") - b.getField("x"), 2) +
         pow(a.getField("y") - b.getField("y"), 2))

  /** Point-in-polygon (ray casting over a literal polygon). Polygon is a
    * driver-side constant — the common filter shape — so the test unrolls
    * to pure arithmetic inside codegen. */
  def inPolygon(pt: Column, poly: Seq[(Double, Double)]): Column = {
    val x = pt.getField("x"); val y = pt.getField("y")
    val n = poly.length
    val crossings = (0 until n).map { i =>
      val (xi, yi) = poly(i); val (xj, yj) = poly((i + 1) % n)
      when(((lit(yi) > y) =!= (lit(yj) > y)) &&
           (x < (lit(xj - xi) * (y - lit(yi)) / lit(yj - yi) + lit(xi))),
        1).otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  // ---- grid index (INDEX op analog) ----------------------------------------
  /** Cell id for a point on a `cellSize` grid — the materialized "spatial
    * index" column (reference: op/IndexOp RTREE): repartitioning by it
    * co-locates spatial neighborhoods. */
  def cellId(pt: Column, cellSize: Double): Column =
    struct(floor(pt.getField("x") / cellSize).cast(LongType).as("cx"),
           floor(pt.getField("y") / cellSize).cast(LongType).as("cy"))

  /** Attach an index column + co-partition by it. */
  def spatialIndex(df: DataFrame, ptCol: String, cellSize: Double,
                   partitions: Int): DataFrame =
    df.withColumn("cell", cellId(col(ptCol), cellSize))
      .repartition(partitions, col("cell"))

  // ---- SPATIAL_JOIN ---------------------------------------------------------
  /** Distance join: pairs (l, r) with dist <= radius.
    *
    * Grid-bucketed: left points replicate to the 3×3 cell neighborhood
    * (radius <= cellSize), right points map to their cell; the join is a
    * plain equi-join on cell id, then an exact distance refine. Shuffle
    * cost O(9·|L| + |R|) — never a cross join.
    */
  def distanceJoin(left: DataFrame, right0: DataFrame,
                   lPt: String, rPt0: String, radius: Double): DataFrame = {
    // same-named point columns on both sides would be ambiguous post-join
    val (right, rPt) =
      if (rPt0 == lPt) (right0.withColumnRenamed(rPt0, s"${rPt0}__r"), s"${rPt0}__r")
      else (right0, rPt0)
    val cellSize = radius
    val lCells = left.withColumn("__dx", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("__dy", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("__cell", struct(
        (floor(col(lPt).getField("x") / cellSize).cast(LongType) + col("__dx")).as("cx"),
        (floor(col(lPt).getField("y") / cellSize).cast(LongType) + col("__dy")).as("cy")))
      .drop("__dx", "__dy")
    val rCells = right.withColumn("__cell", cellId(col(rPt), cellSize))
    lCells.join(rCells, "__cell")
      .where(dist(col(lPt), col(rPt)) <= radius)
      .drop("__cell")
  }
}
