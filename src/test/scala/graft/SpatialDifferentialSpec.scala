package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.spatial.Spatial

/** Differential testing: the grid-bucketed spatial joins against
  * brute-force all-pairs models on seeded random data. Coordinates are
  * quantized to quarter-units so cell-boundary-sitting points (x exactly
  * a multiple of the cell size, including negative multiples) arise by
  * construction — the class of off-by-one-cell bug the 3x3 neighborhood
  * replication must absorb. Scalar geometry (ray cast, segment cross) is
  * replayed in plain Scala with the SAME arithmetic as the Catalyst
  * expressions, so any divergence is a translation bug (element_at
  * indexing, pmod wrap, fold order), not float noise. */
class SpatialDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def q(rnd: scala.util.Random): Double =
    (rnd.nextInt(81) - 40) / 4.0 // [-10, 10] on a 0.25 grid

  test("distanceJoin equals the brute-force all-pairs model on random " +
      "boundary-heavy points") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val left = (1 to 70).map(i => (i.toLong, q(rnd), q(rnd)))
      val right = (1 to 70).map(i => (1000L + i, q(rnd), q(rnd)))
      // radius 1.0 and 0.25 both align with the coordinate lattice, so
      // points sit ON cell edges and pair distances land EXACTLY at the
      // radius (<= must keep them)
      val radius = if (seed % 2 == 0) 1.0 else 0.25
      val lDf = left.toDF("lid", "x", "y")
        .select(col("lid"), Spatial.point(col("x"), col("y")).as("lpt"))
      val rDf = right.toDF("rid", "x", "y")
        .select(col("rid"), Spatial.point(col("x"), col("y")).as("rpt"))
      val model = (for {
        (lid, lx, ly) <- left
        (rid, rx, ry) <- right
        if math.sqrt(math.pow(lx - rx, 2) + math.pow(ly - ry, 2)) <= radius
      } yield (lid, rid)).toSet
      val got = Spatial.distanceJoin(lDf, rDf, "lpt", "rpt", radius)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got == model, s"seed=$seed radius=$radius " +
        s"missing=${(model -- got).take(3)} extra=${(got -- model).take(3)}")
    }
  }

  // plain-Scala replay of containsPoint's exact ray-cast arithmetic
  private def rayCast(poly: IndexedSeq[(Double, Double)],
                      x: Double, y: Double): Boolean = {
    val n = poly.length
    if (n < 1) return false
    val crossings = (0 until n).count { i =>
      val (xi, yi) = poly(i); val (xj, yj) = poly((i + 1) % n)
      ((yi > y) != (yj > y)) && (x < (xj - xi) * (y - yi) / (yj - yi) + xi)
    }
    crossings % 2 == 1
  }

  private def randPoly(rnd: scala.util.Random): IndexedSeq[(Double, Double)] = {
    // random triangles, axis-aligned rectangles and lattice pentagons —
    // rectangles put edges exactly on cell boundaries
    rnd.nextInt(3) match {
      case 0 => IndexedSeq.fill(3)((q(rnd), q(rnd)))
      case 1 =>
        val (x0, y0) = (q(rnd), q(rnd))
        val (w, h) = (1 + rnd.nextInt(12) / 4.0, 1 + rnd.nextInt(12) / 4.0)
        IndexedSeq((x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h))
      case _ => IndexedSeq.fill(5)((q(rnd), q(rnd)))
    }
  }

  test("polygonJoin equals the brute-force ray-cast model on random " +
      "polygons, any cellSize") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(300 + seed)
      val pts = (1 to 80).map(i => (i.toLong, q(rnd), q(rnd)))
      val polys = (1 to 25).map(i => (100L + i, randPoly(rnd)))
      // cellSize sweeps from smaller-than-envelope (multi-cell
      // replication) to larger-than-world (single cell)
      val cellSize = Seq(0.75, 2.0, 5.0, 50.0)(seed % 4)
      val ptDf = pts.toDF("pid", "x", "y")
        .select(col("pid"), Spatial.point(col("x"), col("y")).as("pt"))
      val polyDf = polys
        .map { case (gid, ring) =>
          val wkt = ring.map { case (x, y) => s"$x $y" }
            .mkString("POLYGON ((", ", ", "))")
          (gid, wkt)
        }
        .toDF("gid", "wkt")
        .select(col("gid"), Spatial.wktPolygon(col("wkt")).as("poly"))
      val model = (for {
        (gid, ring) <- polys
        (pid, x, y) <- pts
        if rayCast(ring, x, y)
      } yield (gid, pid)).toSet
      val got = Spatial.polygonJoin(ptDf, polyDf, "pt", "poly", cellSize)
        .select("gid", "pid").as[(Long, Long)].collect().toSet
      assert(got == model, s"seed=$seed cellSize=$cellSize " +
        s"missing=${(model -- got).take(3)} extra=${(got -- model).take(3)}")
    }
  }

  // plain-Scala replay of polyIntersectsPoly: proper edge crossing or
  // either contains the other's first vertex
  private def modelIntersects(a: IndexedSeq[(Double, Double)],
                              b: IndexedSeq[(Double, Double)]): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    def ccw(ax: Double, ay: Double, bx: Double, by: Double,
            cx: Double, cy: Double): Double =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    val cross = a.indices.exists { i =>
      val (p1x, p1y) = a(i); val (p2x, p2y) = a((i + 1) % a.length)
      b.indices.exists { j =>
        val (q1x, q1y) = b(j); val (q2x, q2y) = b((j + 1) % b.length)
        val o1 = ccw(p1x, p1y, p2x, p2y, q1x, q1y)
        val o2 = ccw(p1x, p1y, p2x, p2y, q2x, q2y)
        val o3 = ccw(q1x, q1y, q2x, q2y, p1x, p1y)
        val o4 = ccw(q1x, q1y, q2x, q2y, p2x, p2y)
        o1 * o2 < 0 && o3 * o4 < 0
      }
    }
    cross || rayCast(a, b.head._1, b.head._2) || rayCast(b, a.head._1, a.head._2)
  }

  test("polyIntersectsPoly equals the plain-Scala model on random " +
      "polygon pairs (incl. empty rings)") {
    val rnd = new scala.util.Random(77)
    val pairs = (1 to 120).map { i =>
      val a = if (i % 17 == 0) IndexedSeq.empty[(Double, Double)]
              else randPoly(rnd)
      val b = if (i % 23 == 0) IndexedSeq.empty[(Double, Double)]
              else randPoly(rnd)
      (i.toLong, a, b)
    }
    def wkt(ring: IndexedSeq[(Double, Double)]): String =
      if (ring.isEmpty) "POLYGON" // malformed on purpose -> empty ring
      else ring.map { case (x, y) => s"$x $y" }
        .mkString("POLYGON ((", ", ", "))")
    val df = pairs.map { case (i, a, b) => (i, wkt(a), wkt(b)) }
      .toDF("id", "wa", "wb")
      .select(col("id"),
        Spatial.polyIntersectsPoly(
          Spatial.wktPolygon(col("wa")), Spatial.wktPolygon(col("wb")))
          .as("hit"))
    val got = df.as[(Long, Boolean)].collect().toMap
    pairs.foreach { case (i, a, b) =>
      assert(got(i) == modelIntersects(a, b), s"pair=$i a=$a b=$b")
    }
  }

  test("distanceJoin drops null points instead of pairing them") {
    val lDf = Seq((1L, Some(1.0), Some(1.0)), (2L, None, None))
      .toDF("lid", "x", "y")
      .select(col("lid"),
        when(col("x").isNotNull, Spatial.point(col("x"), col("y"))).as("lpt"))
    val rDf = Seq((10L, Some(1.5), Some(1.0)), (20L, None, None))
      .toDF("rid", "x", "y")
      .select(col("rid"),
        when(col("x").isNotNull, Spatial.point(col("x"), col("y"))).as("rpt"))
    val got = Spatial.distanceJoin(lDf, rDf, "lpt", "rpt", 1.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }
}
