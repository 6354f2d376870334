package graft

import org.apache.spark.sql.functions._

/** Dialect surface for the temporal-join / sampler / store families
  * (round-9): ASOF_JOIN, INTERVAL_JOIN, SESSIONIZE, QUOTA_SAMPLE
  * statements and the SortedStorage / ZOrderStorage / ManifestStorage
  * STORE functions — each asserted equal to its engine-API twin, plus
  * the fail-fast contracts (key-list mismatch, right-column collision). */
class TemporalDialectSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val clicks = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")),
    (2L, "u1", ts("2024-01-01 11:00:00")),
    (3L, "u2", ts("2024-01-01 10:30:00")))
    .toDF("event_id", "user_id", "t")
  private val quotes = Seq(
    (101L, "u1", ts("2024-01-01 09:55:00"), 5.0),
    (102L, "u1", ts("2024-01-01 10:30:00"), 7.0),
    (103L, "u3", ts("2024-01-01 10:00:00"), 9.0))
    .toDF("q_id", "user_id", "q_t", "q_val")

  test("ASOF_JOIN statement equals the api twin, with TOLERANCE and " +
      "DIRECTION routed") {
    val viaScript = graft.piglatin.PigScript.query(spark,
      "x = ASOF_JOIN l BY user_id ON t, r BY user_id ON q_t;",
      "x", tables = Map("l" -> clicks, "r" -> quotes))
    val viaApi = graft.temporal.TemporalJoins.asofJoin(
      clicks, quotes, Seq("user_id"), "t", "q_t",
      Map("q_id" -> "q_id", "q_val" -> "q_val"))
    assert(viaScript.columns.sorted.sameElements(viaApi.columns.sorted))
    val a = viaScript.orderBy("event_id")
      .select("event_id", "q_id", "q_val").collect().toSeq
    val b = viaApi.orderBy("event_id")
      .select("event_id", "q_id", "q_val").collect().toSeq
    assert(a == b)
    // event 1 matches the 09:55 quote; event 2 the 10:30 one
    assert(a(0).getLong(1) == 101L && a(1).getLong(1) == 102L)
    assert(a(2).isNullAt(1))                     // u2: no quote
    // TOLERANCE 600s: event 1 (300s gap) keeps its match, event 2
    // (1800s gap to the 10:30 quote) loses it
    val tol = graft.piglatin.PigScript.query(spark,
      "x = ASOF_JOIN l BY user_id ON t, r BY user_id ON q_t " +
        "TOLERANCE 600000000;",
      "x", tables = Map("l" -> clicks, "r" -> quotes))
      .orderBy("event_id").select("q_id").collect()
    assert(tol(0).getLong(0) == 101L && tol(1).isNullAt(0))
    // DIRECTION forward: event 1 picks the 10:30 quote (least >= t);
    // event 2 at 11:00 has no later quote
    val fwd = graft.piglatin.PigScript.query(spark,
      "x = ASOF_JOIN l BY user_id ON t, r BY user_id ON q_t " +
        "DIRECTION forward;",
      "x", tables = Map("l" -> clicks, "r" -> quotes))
      .orderBy("event_id").select("q_id").collect()
    assert(fwd(0).getLong(0) == 102L && fwd(1).isNullAt(0))
  }

  test("ASOF_JOIN fails fast on key-list mismatch and right-column " +
      "collision") {
    val e = intercept[Exception] {
      graft.piglatin.PigScript.query(spark,
        "x = ASOF_JOIN l BY user_id ON t, r BY q_id ON q_t;",
        "x", tables = Map("l" -> clicks, "r" -> quotes)).collect()
    }
    assert(e.getMessage.contains("key lists must match"), e.getMessage)
    val collide = quotes.withColumnRenamed("q_id", "event_id")
    val e2 = intercept[Exception] {
      graft.piglatin.PigScript.query(spark,
        "x = ASOF_JOIN l BY user_id ON t, r BY user_id ON q_t;",
        "x", tables = Map("l" -> clicks, "r" -> collide)).collect()
    }
    assert(e2.getMessage.contains("collide"), e2.getMessage)
  }

  test("INTERVAL_JOIN and SESSIONIZE statements equal their api twins") {
    val pts = Seq((1L, "k", 5L), (2L, "k", 15L), (3L, "j", 5L))
      .toDF("pt_id", "k", "p")
    val ivs = Seq((10L, "k", 0L, 10L), (11L, "k", 10L, 20L),
      (12L, "j", 100L, 200L)).toDF("iv_id", "k", "lo", "hi")
    val viaScript = graft.piglatin.PigScript.query(spark,
      "x = INTERVAL_JOIN p ON p, i ON lo, hi WIDTH 10 BY k;",
      "x", tables = Map("p" -> pts, "i" -> ivs))
      .select("pt_id", "iv_id").orderBy("pt_id").collect().toSeq
    val viaApi = graft.temporal.TemporalJoins.intervalJoin(
        pts, "p", ivs, "lo", "hi", bucketWidth = 10, keys = Seq("k"))
      .select("pt_id", "iv_id").orderBy("pt_id").collect().toSeq
    assert(viaScript == viaApi && viaScript.size == 2)

    val ev = Seq(("u", 0L), ("u", 100L), ("u", 5000L), ("v", 0L))
      .toDF("k", "t")
    val sessScript = graft.piglatin.PigScript.query(spark,
      "x = SESSIONIZE e BY k ON t GAP 1000;",
      "x", tables = Map("e" -> ev))
      .orderBy("k", "t").select("session_idx").collect().map(_.getLong(0))
    assert(sessScript.toSeq == Seq(1L, 1L, 2L, 1L))
  }

  test("QUOTA_SAMPLE statement equals quotaSampleByHash") {
    val df = (1L to 300L).map(i => (i, "g" + (i % 3))).toDF("id", "g")
    val viaScript = graft.piglatin.PigScript.query(spark,
      "b = QUOTA_SAMPLE d BY g TOP 10 KEY id;",
      "b", tables = Map("d" -> df))
      .select("id").collect().map(_.getLong(0)).toSet
    val viaApi = graft.core.Pipe(df)
      .quotaSampleByHash(col("g"), 10, col("id"))
      .df.select("id").collect().map(_.getLong(0)).toSet
    assert(viaScript == viaApi && viaScript.size == 30)
  }

  test("MIXTURE statement equals mixtureSampleByHash; unnamed strata " +
      "drop; OVERLAP statement routes exact and sketch") {
    val df = (1L to 600L).map(i =>
      (i, Seq("en", "de", "fr", "xx")(i.toInt % 4))).toDF("id", "lang")
    val viaScript = graft.piglatin.PigScript.query(spark,
      "b = MIXTURE d BY lang TARGET 'en' 0.5, 'de' 0.25, 'fr' 0.25 " +
        "KEY id;", "b", tables = Map("d" -> df))
      .select("id").collect().map(_.getLong(0)).toSet
    val viaApi = graft.core.Pipe(df)
      .mixtureSampleByHash(col("lang"),
        Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), col("id"))
      .df.select("id").collect().map(_.getLong(0)).toSet
    assert(viaScript == viaApi && viaScript.nonEmpty)
    assert(!viaScript.exists(_ % 4 == 3), "unnamed stratum xx must drop")

    val a = (1L to 100L).map(Tuple1(_)).toDF("k")
    val b = (51L to 150L).map(Tuple1(_)).toDF("k")
    val ex = graft.piglatin.PigScript.query(spark,
      "o = OVERLAP a, b BY k;", "o",
      tables = Map("a" -> a, "b" -> b)).head()
    assert(ex.getAs[Long]("n_common") == 50L &&
      math.abs(ex.getAs[Double]("jaccard") - 50.0 / 150.0) < 1e-12)
    val sk = graft.piglatin.PigScript.query(spark,
      "o = OVERLAP a, b BY k USING sketch;", "o",
      tables = Map("a" -> a, "b" -> b)).head()
    assert(math.abs(sk.getAs[Long]("n_a") - 100L) <= 10L) // HLL estimate
    val e = intercept[Exception] {
      graft.piglatin.PigScript.query(spark,
        "o = OVERLAP a, b BY k USING nope;", "o",
        tables = Map("a" -> a, "b" -> b)).collect()
    }
    assert(e.getMessage.contains("unknown OVERLAP method"), e.getMessage)
  }

  test("STORE USING ZOrderStorage and ManifestStorage route to the " +
      "layout/manifest stores; content round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("pig_store_").toString
    val df = (1L to 200L).map(i => (i, i % 17, (i * 31) % 13))
      .toDF("id", "a", "b")
    graft.piglatin.PigScript.run(spark,
      s"STORE d INTO '$dir/z' USING ZOrderStorage('a', 'b', '64');",
      tables = Map("d" -> df))
    val zBack = spark.read.parquet(s"$dir/z")
    assert(zBack.count() == 200L &&
      zBack.columns.toSet == Set("id", "a", "b"))
    assert(zBack.select(sum(col("id"))).head().getLong(0) == 201L * 100L)

    graft.piglatin.PigScript.run(spark,
      s"STORE d INTO '$dir/m' USING ManifestStorage('id', '64');",
      tables = Map("d" -> df))
    val mBack = spark.read.parquet(s"$dir/m")
    assert(mBack.count() == 200L)
    val manifest = spark.read.json(s"$dir/m/_manifest")
    assert(manifest.select(sum(col("n_rows"))).head().getLong(0) == 200L)
    assert(manifest.count() > 1L)   // maxRecordsPerFile=64 split files
  }
}
