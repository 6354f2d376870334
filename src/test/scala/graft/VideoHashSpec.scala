package graft

import org.apache.spark.sql.functions._
import graft.multimodal.VideoHash

/** Video near-dup dedup (SURVEY.md §2 row 68d): deterministic JPEG
  * round-trip, twin frame-overlap counts, the doc-frequency cap, and
  * pair detection through the real container+decode path. */
class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  test("planted twins share exactly n-1 frame hashes; pairs need >= 2") {
    val ids = ((0L until 20L) ++ (1000000L until 1000020L))
      .map(java.lang.Long.valueOf).toDS()
    val frames = graft.multimodal.VideoHash.frameHashes(
      VideoHash.plantedGradientAvis(ids))
    val byId = frames.groupBy("id")
      .agg(collect_set(col("fhash")).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    (0L until 20L).foreach { b =>
      val n = 1 + (b % 5).toInt
      assert(byId(b).size == n, s"video $b must carry $n distinct hashes")
      val shared = byId(b).toSet.intersect(byId(b + 1000000L).toSet).size
      assert(shared == n - 1,
        s"twin of $b: expected ${n - 1} shared hashes, got $shared")
    }
    val pairs = VideoHash.nearDupPairs(frames, minShared = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (0L until 20L).filter(_ % 5 >= 2)
      .map(b => (b, b + 1000000L)).toSet
    assert(pairs == expected)
    graft.core.Intermediates.release()
  }

  test("JPEG encode is deterministic: re-planting yields identical hashes") {
    val ids = Seq(7L, 13L).map(java.lang.Long.valueOf).toDS()
    def hashes = graft.multimodal.VideoHash.frameHashes(
      VideoHash.plantedGradientAvis(ids))
      .orderBy("id", "frameIdx").as[(Long, Int, Long)].collect().toSeq
    assert(hashes == hashes, "same planting twice must hash identically")
  }

  test("the doc-frequency cap drops ubiquitous frame hashes (and only them)") {
    // 10 videos all sharing hash 42 (an intro card) + one genuine pair
    val ubiquitous = (0L until 10L).flatMap(i =>
      Seq((i, 0, 42L), (i, 1, 1000L + i)))
    val genuine = Seq((100L, 0, 7L), (100L, 1, 8L), (101L, 0, 7L), (101L, 1, 8L))
    val frames = (ubiquitous ++ genuine).toDF("id", "frameIdx", "fhash")
    val pairs = VideoHash.nearDupPairs(frames, minShared = 2, maxHashFreq = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)),
      "the intro-card bucket must not fan out into pairs")
    graft.core.Intermediates.release()
  }

  test("non-AVI and frameless payloads are skipped, not fatal") {
    val mixed = Seq(
      graft.multimodal.Multimodal.Asset(1L, "video",
        Array[Byte](1, 2, 3, 4), "raw", 0, 0, 0L),
      VideoHash.plantedGradientAvis(
        Seq(java.lang.Long.valueOf(3L)).toDS()).head()).toDS()
    val out = VideoHash.frameHashes(mixed).select("id").distinct()
      .as[Long].collect().toSeq
    assert(out == Seq(3L))
  }
}
