package graft

import org.apache.spark.sql.functions._
import graft.spatial.{Spatial, Visualize}
import graft.temporal.TemporalJoins
import graft.cep.Matcher

/** Regressions for the round-5 spatial/temporal/cep review. */
class SpatialTemporalFixSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin ignores null-time rows on both sides") {
    val left = Seq((1L, Some(10L), "l1"), (1L, Option.empty[Long], "l2"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, Some(5L), "early"), (1L, Option.empty[Long], "nullt"))
      .toDF("k", "t", "rv")
    for (dir <- Seq("backward", "forward")) {
      val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t",
          Map("rv" -> "matched"), direction = dir)
        .select("lv", "matched").as[(String, Option[String])]
        .collect().toMap
      // l2 (null time) must match nothing; l1 matches per direction
      assert(out("l2").isEmpty, s"dir=$dir: null-time left matched")
      if (dir == "backward") assert(out("l1").contains("early"))
      else assert(out("l1").isEmpty) // no right row at t >= 10
      // and the null-TIME right row is never fabricated as a match
      assert(!out.values.flatten.exists(_ == "nullt"), s"dir=$dir")
    }
  }

  test("polyIntersectsPoly yields false on empty rings, not a dead job") {
    val square = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    def polyLit(vs: Seq[(Double, Double)]) =
      typedlit(vs.map { case (x, y) => (x, y) })
        .cast("array<struct<x:double,y:double>>")
    val df = Seq(1).toDF("i")
    val got = df.select(
      Spatial.polyIntersectsPoly(polyLit(square), polyLit(Nil)).as("a"),
      Spatial.polyIntersectsPoly(polyLit(Nil), polyLit(Nil)).as("b"),
      Spatial.polyIntersectsPoly(polyLit(square), polyLit(square)).as("c"))
      .head()
    assert(!got.getBoolean(0) && !got.getBoolean(1) && got.getBoolean(2))
  }

  test("matchSeq reads numeric time columns as micros and drops null rows") {
    val ev = Seq(
      (Some(7L), Some(1000000L), "s", Some(1L)),
      (Some(7L), Some(2000000L), "p", Some(2L)),
      (Some(7L), Option.empty[Long], "s", Some(3L)), // null ts dropped
      (Option.empty[Long], Some(3000000L), "p", Some(4L))) // null key dropped
      .toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("value", lit(0.0))
    val got = Matcher.matchSeq(ev, "user_id", "ts", "event_type",
        "event_id", "value",
        Seq(Matcher.Pos(Matcher.typeIs("s")), Matcher.Pos(Matcher.typeIs("p"))),
        withinMicros = 1500000L)
      .select(element_at(col("ids"), 1), element_at(col("ids"), 2))
      .as[(Long, Long)].collect().toSet
    // numeric ts is micros: within 1.5s covers 1.0s->2.0s exactly; the
    // old seconds reinterpretation would have scaled this 1e6x
    assert(got == Set((1L, 2L)))
  }

  test("polygonJoin tolerates same column name and null points") {
    val square = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    val polys = Seq(Tuple1(square)).toDF("geom")
      .select(col("geom").cast("array<struct<x:double,y:double>>").as("geom"))
    val pts = Seq((1L, Some((1.0, 1.0))), (2L, Option.empty[(Double, Double)]))
      .toDF("id", "geom")
      .select(col("id"),
        col("geom").cast("struct<x:double,y:double>").as("geom"))
    val out = Spatial.polygonJoin(pts, polys, "geom", "geom", cellSize = 8.0)
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("bspPartition routes null-FIELD points to overflow, not a crash") {
    val pts = Seq((1L, Some(1.0), Some(1.0)), (2L, Option.empty[Double], Some(2.0)),
        (3L, Some(3.0), Some(3.0)))
      .toDF("id", "x", "y")
      .select(col("id"), struct(col("x"), col("y")).as("pt"))
    val out = Spatial.bspPartition(pts, "pt", sideLength = 1.0, maxCost = 10L)
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    val sizes = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.last == 1, s"sizes: ${sizes.toSeq}") // the null-x row
  }

  test("scatter survives NaN coordinates and dotted directory names") {
    val dir = java.nio.file.Files.createTempDirectory("graft_viz.2026")
    val pts = Seq((0.0, 0.0), (9.0, 9.0), (Double.NaN, 1.0))
      .toDF("x", "y").select(Spatial.point(col("x"), col("y")).as("pt"))
    val target = dir.resolve("plot") // extension-less under a dotted dir
    Visualize.scatter(pts, col("pt"), target.toString, 16, 16, 3)
    val img = javax.imageio.ImageIO.read(target.toFile)
    assert(img != null && img.getWidth == 16)
    // the two real points span the full scale (NaN did not collapse it)
    def nonWhite(px: Int, py: Int) = (img.getRGB(px, py) & 0xFFFFFF) != 0xFFFFFF
    assert(nonWhite(0, 15) && nonWhite(15, 0))
  }

  test("spatial joins fail fast on reserved helper-column clashes") {
    val pts = Seq((1L, 1.0, 1.0)).toDF("id", "x", "y")
      .select(col("id"), Spatial.point(col("x"), col("y")).as("pt"),
        lit(0).as("__cell"))
    val err = intercept[IllegalArgumentException] {
      Spatial.distanceJoin(pts, pts.withColumnRenamed("pt", "pt2"),
        "pt", "pt2", 1.0)
    }
    assert(err.getMessage.contains("reserved column"))
  }
}
