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
      lit("""-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"""), lit(0))
    // malformed/truncated WKT (< 2 numbers) yields a null point, not an
    // element_at error that would kill the whole scan on one bad row
    when(size(nums) < 2, lit(null))
      .otherwise(struct(element_at(nums, 1).cast(DoubleType).as("x"),
        element_at(nums, 2).cast(DoubleType).as("y")))
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

  // ---- polygon COLUMNS (reference: STARK geometry columns) ------------------
  /** Parse single-ring 'POLYGON ((x y, x y, ...))' WKT into an
    * array<struct<x,y>> vertex column. */
  def wktPolygon(wkt: Column): Column = {
    val nums = regexp_extract_all(wkt,
      lit("""-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"""), lit(0))
    val nPts = (size(nums) / 2).cast(IntegerType)
    // sequence(1, 0) would be the DESCENDING [1, 0] and element_at(_, 0)
    // throws — malformed WKT must give an empty ring, not a dead job
    when(nPts < 1,
        array().cast(ArrayType(StructType(Seq(
          StructField("x", DoubleType), StructField("y", DoubleType))))))
      .otherwise(
        transform(sequence(lit(1), nPts), i =>
          struct(element_at(nums, i * 2 - 1).cast(DoubleType).as("x"),
                 element_at(nums, i * 2).cast(DoubleType).as("y"))))
  }

  /** Axis-aligned bounding box of a polygon column. */
  def envelope(poly: Column): Column = struct(
    array_min(transform(poly, p => p.getField("x"))).as("xmin"),
    array_min(transform(poly, p => p.getField("y"))).as("ymin"),
    array_max(transform(poly, p => p.getField("x"))).as("xmax"),
    array_max(transform(poly, p => p.getField("y"))).as("ymax"))

  /** Point-in-polygon for a polygon COLUMN (ray casting as a fold over
    * the vertex array). Interpreted HOF — fine as a refine over
    * grid-pruned candidates; use [[inPolygon]] when the polygon is a
    * driver-side constant (fully codegen'd). */
  def containsPoint(poly: Column, pt: Column): Column = {
    val x = pt.getField("x"); val y = pt.getField("y")
    val n = size(poly)
    // empty polygon: sequence(0, -1) would be descending — contains nothing
    val crossings = aggregate(
      when(n < 1, array().cast(ArrayType(IntegerType)))
        .otherwise(sequence(lit(0), n - 1)), lit(0),
      (acc, i) => {
        val vi = element_at(poly, i + 1)
        val vj = element_at(poly, pmod(i + 1, n) + 1)
        val xi = vi.getField("x"); val yi = vi.getField("y")
        val xj = vj.getField("x"); val yj = vj.getField("y")
        acc + when(((yi > y) =!= (yj > y)) &&
          (x < (xj - xi) * (y - yi) / (yj - yi) + xi), 1).otherwise(0)
      })
    crossings % 2 === 1
  }

  /** Strict counter-clockwise orientation sign of (a→b→c). */
  private def ccw(ax: Column, ay: Column, bx: Column, by: Column,
                  cx: Column, cy: Column): Column =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Polygon-polygon INTERSECTS for two polygon columns: any pair of
    * edges properly crosses, or either polygon contains the other's
    * first vertex (covers full containment). Proper-crossing test only —
    * shared-boundary-touch without interior overlap is not reported. */
  def polyIntersectsPoly(a: Column, b: Column): Column = {
    // empty rings (wktPolygon's malformed-WKT output) must yield FALSE,
    // not a dead job: sequence(0, size-1) at size 0 DESCENDS to [0,-1]
    // and element_at(poly, 0) errors in every mode — same guard rule as
    // containsPoint. The wrapper is at the end of this method.
    def edges(poly: Column) = sequence(lit(0), size(poly) - 1)
    def nonDegenerate(body: Column): Column =
      when(size(a) === 0 || size(b) === 0, lit(false)).otherwise(body)
    val anyCross = exists(edges(a), i => {
      val p1 = element_at(a, i + 1)
      val p2 = element_at(a, pmod(i + 1, size(a)) + 1)
      exists(edges(b), j => {
        val q1 = element_at(b, j + 1)
        val q2 = element_at(b, pmod(j + 1, size(b)) + 1)
        val (p1x, p1y) = (p1.getField("x"), p1.getField("y"))
        val (p2x, p2y) = (p2.getField("x"), p2.getField("y"))
        val (q1x, q1y) = (q1.getField("x"), q1.getField("y"))
        val (q2x, q2y) = (q2.getField("x"), q2.getField("y"))
        val o1 = ccw(p1x, p1y, p2x, p2y, q1x, q1y)
        val o2 = ccw(p1x, p1y, p2x, p2y, q2x, q2y)
        val o3 = ccw(q1x, q1y, q2x, q2y, p1x, p1y)
        val o4 = ccw(q1x, q1y, q2x, q2y, p2x, p2y)
        (o1 * o2 < 0) && (o3 * o4 < 0)
      })
    })
    nonDegenerate(anyCross ||
      containsPoint(a, element_at(b, 1)) ||
      containsPoint(b, element_at(a, 1)))
  }

  // ---- grid index (INDEX op analog) ----------------------------------------
  /** Cell id for a point on a `cellSize` grid — the materialized "spatial
    * index" column (reference: op/IndexOp RTREE): repartitioning by it
    * co-locates spatial neighborhoods. */
  def cellId(pt: Column, cellSize: Double): Column =
    struct(floor(pt.getField("x") / cellSize).cast(LongType).as("cx"),
           floor(pt.getField("y") / cellSize).cast(LongType).as("cy"))

  /** Helper-column guard shared by the grid joins (the same fail-fast
    * rule as TemporalJoins.reserveCols and bspPartition): silently
    * overwriting-then-dropping a user's column of the same name would
    * LOSE that column from the output. */
  private def reserveHelpers(existing: Seq[String], helpers: Seq[String]): Unit = {
    val clash = helpers.filter(existing.contains)
    require(clash.isEmpty,
      s"input already has reserved column(s) ${clash.mkString(", ")}")
  }

  /** A usable coordinate: non-null and finite. NaN/±Inf coordinates are
    * toxic under ANSI mode — their grid-cell Long cast throws, killing a
    * whole job on one dirty row — and they poison driver-side min/max
    * bounds; every index/join below filters on this first. */
  private def finiteCoord(c: Column): Column =
    !isnan(c) && abs(c) =!= lit(Double.PositiveInfinity)

  private def finitePoint(pt: Column): Column =
    pt.isNotNull && finiteCoord(pt.getField("x").cast(DoubleType)) &&
      finiteCoord(pt.getField("y").cast(DoubleType))

  /** Attach an index column + co-partition by it. A pre-existing `cell`
    * column (re-indexing an already-indexed relation) is replaced — it is
    * this operator's own output name, withColumn-style. */
  def spatialIndex(df: DataFrame, ptCol: String, cellSize: Double,
                   partitions: Int): DataFrame = {
    // null/NaN/Inf points get a null cell (grouped together) instead of
    // an ANSI Long-cast crash on the first dirty row
    df.drop("cell").withColumn("cell",
        when(finitePoint(col(ptCol)), cellId(col(ptCol), cellSize)))
      .repartition(partitions, col("cell"))
  }

  /** Interleave the low `bits` bits of two quantized coordinates into a
    * Morton (Z-order) code — pure column arithmetic, fully codegen'd. */
  private def morton(qx: Column, qy: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(qx, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(qy, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Space-filling-curve index (the `INDEX ... USING rtree` analog): the
    * Spark-native equivalent of a bulk-loaded (STR-packed) R-tree is
    * RANGE partitioning on a Z-order curve — each partition then covers
    * a compact spatial region (what an R-tree leaf page is), so later
    * spatial joins and range filters touch few partitions instead of
    * hashing neighbors apart. Coordinates quantize to `bits`-bit cells
    * over the data's bounding box (one tiny driver agg — 4 doubles, same
    * bounded-collect budget as bspPartition's histogram); the Morton
    * code lands in a `zorder` column, range-partitioned and sorted
    * within partitions. Null/NaN points sort into the nulls partition,
    * matching the grid index's behavior for dirty rows. */
  def zOrderIndex(df: DataFrame, ptCol: String, partitions: Int,
                  bits: Int = 16): DataFrame = {
    require(partitions > 0, s"zOrderIndex needs partitions > 0 (got $partitions)")
    require(bits > 0 && bits <= 24, s"zOrderIndex bits must be 1..24 (got $bits)")
    val df0 = df.drop("zorder") // re-indexing replaces our own output col
    val x = col(ptCol).getField("x").cast(DoubleType)
    val y = col(ptCol).getField("y").cast(DoubleType)
    // bounds over FINITE coordinates only: one NaN row would make
    // max() = NaN (NaN sorts greatest) and poison every row's quant;
    // one Inf row would collapse the span the same way
    val clean = finitePoint(col(ptCol))
    val b = df0.where(clean).agg(min(x), max(x), min(y), max(y)).head()
    if ((0 to 3).exists(b.isNullAt)) // empty, all-null or x/y-null points
      return df0.withColumn("zorder", lit(null).cast(LongType))
    val (minX, maxX) = (b.getDouble(0), b.getDouble(1))
    val (minY, maxY) = (b.getDouble(2), b.getDouble(3))
    val scaleMax = (1L << bits) - 1
    // degenerate spans (all points share a coordinate) divide by 1, not 0
    def quant(c: Column, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(greatest(
        floor((c - lit(lo)) / lit(span) * scaleMax).cast(LongType),
        lit(0L)), lit(scaleMax))
    }
    df0.withColumn("zorder",
        when(clean, morton(quant(x, minX, maxX), quant(y, minY, maxY), bits)))
      .repartitionByRange(partitions, col("zorder"))
      .sortWithinPartitions(col("zorder"))
  }

  // ---- BSP partitioning (PARTITION ... USING bsp) ---------------------------
  /** Driver-side cost-balanced binary space partitioning over an
    * occupied-cell histogram: recursively halve the region along the
    * x- or y-cut that best balances cost (minimizing the heavier half)
    * until every region's cost is <= `maxCost` or it cannot be cut
    * (single distinct cell coordinate on both axes). Pure function of the
    * histogram — unit-testable without Spark. Returns one cell-array per
    * region. Explicit worklist, not recursion: adversarially skewed
    * histograms can force O(cells) sliver cuts, which would overflow the
    * call stack at millions of cells. */
  def bspRegions(cells: Array[(Long, Long, Long)],
                 maxCost: Long): Seq[Array[(Long, Long, Long)]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[(Long, Long, Long)]]
    val work = scala.collection.mutable.Stack(cells)
    while (work.nonEmpty) {
      val cs = work.pop()
      val total = cs.iterator.map(_._3).sum
      // best cut on one axis: prefix-scan the per-coordinate costs in
      // coordinate order; a cut after coordinate k sends <=k left.
      // Returns (threshold, heavierHalfCost), None if < 2 distinct coords
      def cut(keyOf: ((Long, Long, Long)) => Long): Option[(Long, Long)] = {
        val byKey = cs.groupBy(keyOf).view
          .mapValues(_.iterator.map(_._3).sum).toArray.sortBy(_._1)
        if (byKey.length < 2) None
        else {
          var acc = 0L
          var bestThr = 0L
          var bestBal = Long.MaxValue
          var i = 0
          while (i < byKey.length - 1) {
            acc += byKey(i)._2
            val bal = math.max(acc, total - acc)
            if (bal < bestBal) { bestBal = bal; bestThr = byKey(i)._1 }
            i += 1
          }
          Some((bestThr, bestBal))
        }
      }
      if (total <= maxCost) { if (cs.nonEmpty) out += cs }
      else ((cut(_._1), cut(_._2)) match {
        case (Some((tx, bx)), Some((ty, by))) =>
          Some(if (bx <= by) (true, tx) else (false, ty))
        case (Some((tx, _)), None) => Some((true, tx))
        case (None, Some((ty, _))) => Some((false, ty))
        case _ => None // one cell hotter than maxCost — cannot cut further
      }) match {
        case Some((onX, thr)) =>
          val (l, r) = cs.partition(c => (if (onX) c._1 else c._2) <= thr)
          work.push(l); work.push(r)
        case None => if (cs.nonEmpty) out += cs
      }
    }
    out.toSeq
  }

  /** Cost-based binary-space partitioning (reference: `PARTITION … USING
    * bsp(...)` — parser/PigParser.scala:1007-1009, delegating to STARK's
    * `BSPartitioner(rdd, sideLength, maxCostPerPartition, pointsOnly)`):
    * balances partition COST (point count) on skewed data where a uniform
    * grid leaves most cells empty and a few overloaded.
    *
    * Plan shape at scale: (1) ONE partial-agg pass builds the
    * occupied-cell histogram at `sideLength` granularity (map-side
    * combine, so the shuffle is distinct-cells-sized); (2) the driver
    * runs [[bspRegions]] over it — bounded by `maxCells` occupied cells
    * (raise `sideLength` to coarsen if hit; occupied cells, not grid
    * area, is what is collected); (3) the tiny cell->region map
    * broadcast-joins back and the data moves ONCE, through an identity
    * Partitioner on the region id. The deliberate one-hop RDD detour is
    * the point of the operator: region k -> partition k EXACTLY (like the
    * reference's STARK partitioners), which no DataFrame repartition
    * gives — hash folds distinct regions together and range partitioning
    * samples its boundaries, both of which can break the maxCost bound.
    *
    * The visible schema is unchanged — like the reference's Partitioner,
    * only physical placement moves.
    */
  def bspPartition(df: DataFrame, ptCol: String, sideLength: Double,
                   maxCost: Long, maxCells: Int = 1 << 21): DataFrame = {
    require(sideLength > 0,
      s"bsp sideLength must be > 0 (got $sideLength)")
    require(maxCost > 0,
      s"bsp maxCostPerPartition must be > 0 (got $maxCost)")
    val helpers = Seq("__bsp_cx", "__bsp_cy", "__bsp_pid")
    require(!df.columns.exists(helpers.contains),
      s"input already has a ${helpers.mkString("/")} column")
    val cell = cellId(col(ptCol), sideLength)
    // a non-null point STRUCT can still carry null x/y fields — its cell
    // is struct(null, null), which would NPE the driver's getLong on the
    // histogram — and a NaN/Inf coordinate would throw in the cell Long
    // cast under ANSI before any null check ran; exclude both on the RAW
    // coordinates so such rows flow to the overflow partition like null
    // structs do
    val hist = df.where(finitePoint(col(ptCol)))
      .groupBy(cell.as("__cell")).agg(count(lit(1)).as("__n"))
      .limit(maxCells + 1)
      .select(col("__cell.cx"), col("__cell.cy"), col("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    require(hist.length <= maxCells,
      s"bsp histogram exceeds $maxCells occupied cells at sideLength=" +
        s"$sideLength — coarsen sideLength (the driver holds one row per " +
        "OCCUPIED cell)")
    if (hist.isEmpty) return df
    val regions = bspRegions(hist, maxCost)
    val spark = df.sparkSession
    import spark.implicits._
    val cellToPid = regions.zipWithIndex.flatMap { case (cs, pid) =>
      cs.map(c => (c._1, c._2, pid)) }
    val pidDf = spark.createDataset(cellToPid)
      .toDF("__bsp_cx", "__bsp_cy", "__bsp_pid")
    // the same ANSI NaN/Inf hazard as the histogram: guard the per-row
    // cell exprs so dirty rows compare null (→ no match → overflow)
    val safeCx = when(finitePoint(col(ptCol)), cell.getField("cx"))
    val safeCy = when(finitePoint(col(ptCol)), cell.getField("cy"))
    val tagged = df.join(broadcast(pidDf),
      safeCx === col("__bsp_cx") && safeCy === col("__bsp_cy"), "left")
    val pidIdx = tagged.schema.fieldIndex("__bsp_pid")
    val width = df.schema.length // join output = left cols ++ right cols
    val nRegions = regions.length
    val placed = tagged.rdd
      .map { row =>
        // rows with no region (null geometry, or a cell the histogram
        // missed if `df` is nondeterministic between the two traversals)
        // go to a dedicated OVERFLOW partition after the regions — never
        // into region 0, whose <= maxCost bound must survive
        val pid = if (row.isNullAt(pidIdx)) nRegions else row.getInt(pidIdx)
        (pid, org.apache.spark.sql.Row.fromSeq(row.toSeq.take(width)))
      }
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = nRegions + 1
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    spark.createDataFrame(placed, df.schema)
  }

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
    // radius = 0 would make the grid divisor 0: floor(x / 0.0) = ±Inf and
    // the Long cast throws under ANSI mode. Distance ≤ 0 between points
    // IS coordinate equality — a plain equi-join, no grid needed.
    require(radius > 0,
      s"distanceJoin needs radius > 0 (got $radius); " +
        "use equalityJoin for exact point-match predicates")
    // same-named point columns on both sides would be ambiguous post-join
    val (right, rPt) =
      if (rPt0 == lPt) (right0.withColumnRenamed(rPt0, s"${rPt0}__r"), s"${rPt0}__r")
      else (right0, rPt0)
    reserveHelpers(left.columns ++ right.columns,
      Seq("__dx", "__dy", "__cell"))
    val cellSize = radius
    // null points (wktPoint's malformed-WKT output) can never satisfy
    // the distance refine, but their struct(null,null) cell ids DO
    // equi-join each other (struct comparison treats null fields as
    // equal) — 9·|Lnull|·|Rnull| wasted pairs on dirty data; and a
    // NaN/Inf coordinate would throw in the cell Long cast under ANSI —
    // drop both classes early
    val lCells = left.where(finitePoint(col(lPt)))
      .withColumn("__dx", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("__dy", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("__cell", struct(
        (floor(col(lPt).getField("x") / cellSize).cast(LongType) + col("__dx")).as("cx"),
        (floor(col(lPt).getField("y") / cellSize).cast(LongType) + col("__dy")).as("cy")))
      .drop("__dx", "__dy")
    val rCells = right.where(finitePoint(col(rPt)))
      .withColumn("__cell", cellId(col(rPt), cellSize))
    lCells.join(rCells, "__cell")
      .where(dist(col(lPt), col(rPt)) <= radius)
      .drop("__cell")
  }

  /** Exact point-match join (the radius-0 degenerate of distanceJoin,
    * e.g. Pig `SPATIAL_JOIN ... CONTAINS/INTERSECTS(point, point)`): a
    * plain equi-join on the coordinates — one hash shuffle, no grid. */
  def equalityJoin(left: DataFrame, right0: DataFrame,
                   lPt: String, rPt0: String): DataFrame = {
    val (right, rPt) =
      if (rPt0 == lPt) (right0.withColumnRenamed(rPt0, s"${rPt0}__r"), s"${rPt0}__r")
      else (right0, rPt0)
    left.join(right,
      col(lPt).getField("x") === col(rPt).getField("x") &&
        col(lPt).getField("y") === col(rPt).getField("y"))
  }

  /** Point-in-polygon join (geometry-column vs geometry-column): each
    * polygon replicates to every grid cell its ENVELOPE overlaps, points
    * map to their single cell, the join is an equi-join on cell id and
    * the exact ray-cast refine runs on grid-pruned candidates only.
    * Shuffle cost O(|polys|·cellsPerEnvelope + |points|) — never a cross
    * join; AQE rebalances hot cells. Pick `cellSize` near the typical
    * envelope extent so polygons replicate to O(1) cells. */
  def polygonJoin(points: DataFrame, polys1: DataFrame,
                  ptCol: String, polyCol0: String,
                  cellSize: Double): DataFrame = {
    require(cellSize > 0, s"polygonJoin needs cellSize > 0 (got $cellSize)")
    // same rename guard as distanceJoin/equalityJoin: identical column
    // names would be AMBIGUOUS_REFERENCE after the cell join
    val (polys0, polyCol) =
      if (polyCol0 == ptCol)
        (polys1.withColumnRenamed(polyCol0, s"${polyCol0}__r"), s"${polyCol0}__r")
      else (polys1, polyCol0)
    reserveHelpers(points.columns ++ polys0.columns,
      Seq("__cx", "__cy", "__cell"))
    val env = envelope(col(polyCol))
    val polyCells = polys0
      .withColumn("__cx", explode(sequence(
        floor(env.getField("xmin") / cellSize).cast(LongType),
        floor(env.getField("xmax") / cellSize).cast(LongType))))
      .withColumn("__cy", explode(sequence(
        floor(env.getField("ymin") / cellSize).cast(LongType),
        floor(env.getField("ymax") / cellSize).cast(LongType))))
      .withColumn("__cell", struct(col("__cx").as("cx"), col("__cy").as("cy")))
      .drop("__cx", "__cy")
    // null points can't be contained, their null-field cell structs
    // would still equi-join (see distanceJoin), and NaN/Inf coords throw
    // in the cell Long cast under ANSI — drop early
    val ptCells = points.where(finitePoint(col(ptCol)))
      .withColumn("__cell", cellId(col(ptCol), cellSize))
    // a point lives in exactly one cell, so no post-join dedup is needed
    polyCells.join(ptCells, "__cell")
      .where(containsPoint(col(polyCol), col(ptCol)))
      .drop("__cell")
  }
}
