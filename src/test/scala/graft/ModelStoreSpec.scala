package graft

import org.apache.spark.sql.functions._
import graft.core.ModelStore

/** ModelStore: train-once-reuse (second call loads, bit-equal values),
  * key sensitivity (changed params or changed input data retrain), and
  * exact double round-trips for every codec. */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir =
    java.nio.file.Files.createTempDirectory("graft_modelstore").toString

  private def emb = graft.core.Tables(spark, sfDir, "embeddings")

  test("centroids: second call loads instead of retraining, bit-equal") {
    val dir = freshDir
    var calls = 0
    def train = { calls += 1
      graft.sim.Similarity.ivfCentroids(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
        nCells = 4, sampleSize = 256) }
    val a = ModelStore.cachedCentroids(dir, "ivf-4", emb)(train)
    val b = ModelStore.cachedCentroids(dir, "ivf-4", emb)(train)
    assert(calls == 1, "second call must hit the store")
    assert(a.size == b.size && a.zip(b).forall { case (x, y) =>
      java.util.Arrays.equals(x, y) }, "loaded centroids must be bit-equal")
    // changed params -> different key -> retrain
    ModelStore.cachedCentroids(dir, "ivf-8", emb)(train)
    assert(calls == 2)
  }

  test("codebooks and merges round-trip exactly (incl. awkward doubles)") {
    val dir = freshDir
    val cb = Seq(
      Seq(Array(0.1 + 0.2, -0.0, Double.MinPositiveValue),
        Array(1e300, -1.7976931348623157e308, 4.9e-324)),
      Seq(Array(math.Pi, math.E, 1.0 / 3.0)))
    val got = ModelStore.cachedCodebooks(dir, "t", emb)(cb)
    assert(got.size == cb.size && got.zip(cb).forall { case (ga, ca) =>
      ga.zip(ca).forall { case (g, c) => java.util.Arrays.equals(g, c) } })
    val got2 = ModelStore.cachedCodebooks(dir, "t", emb)(
      sys.error("must not retrain"))
    assert(got2.zip(cb).forall { case (g, c) =>
      g.zip(c).forall { case (x, y) => java.util.Arrays.equals(x, y) } })

    val merges = Seq(("a", "b</w>"), ("ab</w>", "c"), ("é", "漢</w>"))
    val m1 = ModelStore.cachedMerges(dir, "m", emb)(merges)
    val m2 = ModelStore.cachedMerges(dir, "m", emb)(
      sys.error("must not retrain"))
    assert(m1 == merges && m2 == merges)
  }

  test("degenerate empty models round-trip (no phantom empty codebook)") {
    val dir = freshDir
    assert(ModelStore.cachedCodebooks(dir, "e", emb)(Seq()) == Seq())
    assert(ModelStore.cachedCodebooks(dir, "e", emb)(
      sys.error("must not retrain")) == Seq(),
      "loaded empty model must decode to Seq(), not Seq(Seq())")
    assert(ModelStore.cachedCentroids(dir, "e", emb)(Seq()) == Seq())
    assert(ModelStore.cachedMerges(dir, "e", emb)(Seq()) == Seq())
  }

  test("stale tmp files from a dead JVM are swept on the next write") {
    val dir = freshDir
    val stale = java.nio.file.Paths.get(dir, ".tmp_dead_12345678")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(stale, "torn")
    java.nio.file.Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    ModelStore.cachedMerges(dir, "s", emb)(Seq(("a", "b")))
    assert(!java.nio.file.Files.exists(stale), "stale tmp must be swept")
  }

  test("regenerated input data invalidates the cached model") {
    val dir = freshDir
    val data = java.nio.file.Files
      .createTempDirectory("graft_modelstore_in").toString
    Seq((1L, "x")).toDF("id", "t").write.mode("overwrite").parquet(data)
    var calls = 0
    def input = spark.read.parquet(data)
    ModelStore.cachedMerges(dir, "m", input) { calls += 1; Seq(("a", "b")) }
    ModelStore.cachedMerges(dir, "m", input) { calls += 1; Seq(("a", "b")) }
    assert(calls == 1)
    Thread.sleep(1100) // ensure a distinct mtime even on 1s-resolution fs
    Seq((2L, "y"), (3L, "z")).toDF("id", "t")
      .write.mode("overwrite").parquet(data)
    ModelStore.cachedMerges(dir, "m", input) { calls += 1; Seq(("c", "d")) }
    assert(calls == 2, "changed input files must miss the cache")
  }
}
