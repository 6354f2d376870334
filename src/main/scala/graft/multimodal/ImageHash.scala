package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + near-duplicate image dedup (the image-side
  * complement of the text dedup family — LAION-style pipelines dedup
  * crawled images by perceptual hash before training).
  *
  * dHash (difference hash): area-average the raster to a 9×8 grayscale
  * grid, emit one bit per horizontally-adjacent cell pair (right > left),
  * 64 bits total. Robust to resizing and re-encoding (the hash sees
  * gradients, not absolute levels — see the resize-invariance spec), and
  * Hamming distance between hashes tracks perceptual distance.
  *
  * Scale shape: hashing is a per-partition map over payloads (binaries
  * never shuffle — the [[Multimodal]] contract), and pair-finding reuses
  * the pigeonhole-banded Hamming join of [[graft.dedup.Dedup.simhashPairs]]
  * — 8-byte hashes are all that ever reach an exchange, identical to the
  * SimHash text path. Nothing is all-pairs.
  *
  * Decode is REAL (javax.imageio — PNG/JPEG/GIF/BMP); grayscale is
  * integer ITU-R 601 luma `(299·R + 587·G + 114·B) / 1000`, exact for
  * gray pixels (R=G=B=v ⇒ luma=v), which is what lets the planted-BMP
  * DuckDB oracle replay the full decode→hash pipeline arithmetically.
  */
object ImageHash {

  /** 64-bit dHash over a (gw+1)×gh cell grid (default 9×8). Cell (cx,cy)
    * averages the pixel block `[cx·w/(gw+1), (cx+1)·w/(gw+1)) ×
    * [cy·h/gh, (cy+1)·h/gh)`; bit `y·gw + x` is set iff
    * `mean(x+1,y) > mean(x,y)`. An image already at grid size hits the
    * identity path (one pixel per cell), so its hash is pure pixel
    * arithmetic — the oracle contract. */
  def dHash(img: java.awt.image.BufferedImage,
            gw: Int = 8, gh: Int = 8): Long = {
    val cols = gw + 1
    val w = img.getWidth
    val h = img.getHeight
    require(w >= cols && h >= gh,
      s"dHash needs an image of at least ${cols}x$gh (got ${w}x$h)")
    val means = Array.ofDim[Double](gh, cols)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * h / gh
      val y1 = (cy + 1) * h / gh
      var cx = 0
      while (cx < cols) {
        val x0 = cx * w / cols
        val x1 = (cx + 1) * w / cols
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sum += (299 * r + 587 * g + 114 * b) / 1000
            x += 1
          }
          y += 1
        }
        means(cy)(cx) = sum.toDouble / ((y1 - y0).toLong * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    var hash = 0L
    var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw) {
        if (means(y)(x + 1) > means(y)(x)) hash |= 1L << (y * gw + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Decode + hash one payload (javax.imageio). */
  def dHashBytes(payload: Array[Byte]): Long = {
    Multimodal.fastImageIO
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null) sys.error("ImageIO: unreadable image payload")
    dHash(img)
  }

  /** (id, dhash) for every image asset — per-partition decode, payloads
    * never shuffle. Non-image modalities are filtered before decode. */
  def hashAssets(assets: Dataset[Multimodal.Asset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.modality == "image")
      .mapPartitions(it => it.map(a => (a.id, dHashBytes(a.payload))))
      .toDF("id", "dhash")
  }

  /** Near-duplicate image pairs within `maxDist` Hamming bits — the
    * pigeonhole-banded join from the SimHash text path (the banding is
    * hash-agnostic: any pair within maxDist agrees on ≥1 of maxDist+1
    * chunks, so recall is exact). Input columns (id, dhash).
    *
    * The hash table is persisted before the self-join: the upstream of
    * `hashes` is a DECODE (ImageIO per payload) and an unpersisted
    * self-join would run it twice — the 8-byte (id, hash) rows are the
    * cheapest possible thing to cache. */
  def nearDupPairs(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    val cached = graft.core.Intermediates.track(
      hashes.select(col("id"), col("dhash").as("simhash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    graft.dedup.Dedup.simhashPairs(cached, maxDist)
  }

  /** Deterministic REAL 9×8 grayscale BMP per id — every pixel is pure id
    * arithmetic, so a DuckDB oracle can replay decode→luma→dHash bit for
    * bit. Ids ≥ 1e6 are PLANTED NEAR-DUP TWINS of id−1e6: the same raster
    * with ONE pixel inverted (+128 mod 256), which can flip at most the
    * two dHash bits adjacent to that pixel — Hamming ≤ 2, inside every
    * sensible dedup threshold. Base pixel:
    * `v = (b·7 + (1+b%13)·x·29 + (1+b%11)·y·53 + (b²%251)·x·y +
    * (b%17)·11·x²) % 256` — the per-doc gradient coefficients (linear,
    * bilinear AND quadratic terms) give distinct docs distinct bit
    * patterns with enough entropy that organic Hamming-≤3 collisions
    * are empirically zero per 2000 images (the earlier linear-only
    * form produced ~7k — a quadratic pair-output artifact at scale,
    * not a dedup property).
    * Encoding runs per-partition (BMP = lossless, exact round-trip). */
  def plantedBmpAssets(ids: Dataset[java.lang.Long]): Dataset[Multimodal.Asset] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.filter(_ != null).map(_.longValue()).mapPartitions { it =>
      Multimodal.fastImageIO
      it.map { id =>
        val b = id % 1000000L
        val perturbed = id >= 1000000L
        val px = (b % 9L).toInt
        val py = (b % 8L).toInt
        val img = new java.awt.image.BufferedImage(
          9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 9) {
            var v = ((b * 7 + (1 + b % 13) * x * 29 +
              (1 + b % 11) * y * 53 + (b * b % 251) * x * y +
              (b % 17) * 11 * x * x) % 256).toInt
            if (perturbed && x == px && y == py) v = (v + 128) % 256
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        if (!javax.imageio.ImageIO.write(img, "bmp", out))
          sys.error("ImageIO: no BMP writer")
        Multimodal.Asset(id, "image", out.toByteArray, "bmp", 9, 8, 0L)
      }
    }
  }
}
