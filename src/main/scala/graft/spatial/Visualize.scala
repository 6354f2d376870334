package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** VISUALIZE (reference: op/Visualize.scala, whose Spark backend
  * delegates to the STARK library's RDD.visualize): scatter-render a
  * point-geometry column to an image file.
  *
  * Scale design: the points reduce to PER-PIXEL counts on the executors
  * (`groupBy(px, py)`), so the driver collects at most width×height rows
  * no matter the input size — an image can't show more detail than its
  * pixels, so nothing is lost. Density maps to opacity. JDK-only
  * rendering (headless AWT + ImageIO), no extra dependencies. */
object Visualize {

  /** `pointsOnly` (reference parser keyword POINTSONLY): uniform
    * full-opacity dots — skips the density→opacity shading, so the
    * per-pixel counts are only used for point placement. */
  def scatter(df: DataFrame, pt: Column, path: String,
              width: Int, height: Int, pointSize: Int = 1,
              pointsOnly: Boolean = false): Unit = {
    require(width > 0 && height > 0, s"bad image size ${width}x$height")
    // non-finite coordinates are as toxic as nulls: max() sorts NaN
    // greatest and an Inf bound zeroes the scale (every point lands in
    // pixel column 0), and the ANSI int cast of floor(NaN/Inf·0) errors —
    // keep only finite rows
    val xy = df.select(pt.getField("x").cast(DoubleType).as("x"),
        pt.getField("y").cast(DoubleType).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull &&
        !isnan(col("x")) && !isnan(col("y")) &&
        abs(col("x")) =!= Double.PositiveInfinity &&
        abs(col("y")) =!= Double.PositiveInfinity)
    val b = xy.agg(min("x"), max("x"), min("y"), max("y")).head()
    if (b.isNullAt(0)) return // empty relation: nothing to draw
    val (minX, maxX) = (b.getDouble(0), b.getDouble(1))
    val (minY, maxY) = (b.getDouble(2), b.getDouble(3))
    val sx = if (maxX > minX) (width - 1) / (maxX - minX) else 0.0
    val sy = if (maxY > minY) (height - 1) / (maxY - minY) else 0.0
    // y flips: image row 0 is the TOP (max y)
    val pixels = xy.select(
        floor((col("x") - minX) * sx).cast("int").as("px"),
        floor((lit(maxY) - col("y")) * sy).cast("int").as("py"))
      .groupBy("px", "py").agg(count(lit(1)).as("n"))
      .collect()
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, 0, width, height)
      val maxN = pixels.iterator.map(_.getLong(2)).foldLeft(1L)(math.max)
      val d = math.max(1, pointSize)
      pixels.foreach { r =>
        val alpha =
          if (pointsOnly) 255 else (55L + 200L * r.getLong(2) / maxN).toInt
        g.setColor(new java.awt.Color(30, 60, 160, alpha))
        g.fillOval(r.getInt(0) - d / 2, r.getInt(1) - d / 2, d, d)
      }
    } finally g.dispose()
    // sniff the extension from the FILENAME only — a dotted directory
    // ("/data/run.2026/plot") would otherwise yield ext "2026/plot" and
    // fail both writer lookups instead of defaulting to png
    val fname = path.substring(
      math.max(path.lastIndexOf('/'), path.lastIndexOf('\\')) + 1)
    val dot = fname.lastIndexOf('.')
    val ext = if (dot > 0 && dot < fname.length - 1) fname.substring(dot + 1)
              else "png"
    // ImageIO.write returns false when no writer accepts the image (e.g.
    // ARGB to jpeg on many JDKs) — retry with the alpha channel dropped,
    // then fail loudly rather than "succeed" with no file written
    if (!javax.imageio.ImageIO.write(img, ext, new java.io.File(path))) {
      val rgb = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = rgb.createGraphics()
      try g2.drawImage(img, 0, 0, java.awt.Color.WHITE, null)
      finally g2.dispose()
      if (!javax.imageio.ImageIO.write(rgb, ext, new java.io.File(path)))
        sys.error(s"VISUALIZE: no image writer for extension '$ext' ($path)")
    }
  }
}
