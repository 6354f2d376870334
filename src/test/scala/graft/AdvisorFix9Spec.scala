package graft

import org.apache.spark.sql.functions._
import graft.core.{Overlap, Pipe}

/** Round-9 hardening: null-safe diff/outlier semantics, fail-fast
  * contracts (diff unique keys, CDC_CHUNKS arity), rate-floor clamp in
  * temperature rebalancing, zero-guarded jaccard, and the madOutliers
  * exact-vs-approx percentile regimes. */
class AdvisorFix9Spec extends SparkSpec {
  import spark.implicits._

  // ---- Overlap.diff -----------------------------------------------------
  test("diff flags NULL<->value content flips as changed (null-safe <=>)") {
    val a = Seq((1L, "same"), (2L, null.asInstanceOf[String]),
      (3L, "was"), (4L, null.asInstanceOf[String])).toDF("id", "text")
    val b = Seq((1L, "same"), (2L, "now-present"),
      (3L, null.asInstanceOf[String]), (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = Overlap.diff(a, col("id"), col("text"),
        b, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // value->value same: unchanged (absent); null->value and value->null:
    // changed; null->null: unchanged (absent)
    assert(out == Map(2L -> "changed", 3L -> "changed"), out.toString)
  }

  test("diff fails fast on duplicate keys; opt-out restores laziness") {
    val a = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("id", "text")
    val b = Seq((2L, "z")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Overlap.diff(a, col("id"), col("text"), b, col("id"), col("text"))
    }
    assert(e.getMessage.contains("duplicate key") &&
      e.getMessage.contains("side 'a'"), e.getMessage)
    // duplicate on the RIGHT side is reported with its side
    val e2 = intercept[IllegalArgumentException] {
      Overlap.diff(b, col("id"), col("text"), a, col("id"), col("text"))
    }
    assert(e2.getMessage.contains("side 'b'"), e2.getMessage)
    // explicit opt-out: construction succeeds (caller owns the contract)
    val lazyDf = Overlap.diff(a, col("id"), col("text"),
      b, col("id"), col("text"), validateUniqueKeys = false)
    assert(lazyDf.columns.toSeq == Seq("k", "status"))
  }

  test("exact overlap on empty inputs returns jaccard 0.0, not " +
      "DIVIDE_BY_ZERO") {
    val empty = spark.emptyDataset[Long].toDF("k")
    val r = Overlap.exact(empty, col("k"), empty, col("k")).head()
    assert(r.getAs[Long]("n_a") == 0L && r.getAs[Long]("n_b") == 0L &&
      r.getAs[Long]("n_common") == 0L &&
      r.getAs[Double]("jaccard") == 0.0)
    // all-null keys reduce to the same boundary
    val nulls = Seq(Tuple1(null.asInstanceOf[java.lang.Long])).toDF("k")
    val r2 = Overlap.exact(nulls, col("k"), nulls, col("k")).head()
    assert(r2.getAs[Double]("jaccard") == 0.0)
  }

  // ---- madOutliers ------------------------------------------------------
  test("madOutliers passes null-group rows through with a real flag") {
    // group null: {10,10,10,1000} — the 1000 is an outlier WITHIN the
    // null group; a null-unsafe join would drop all four rows
    val df = (Seq(("a", 10.0), ("a", 11.0), ("a", 9.0)) ++
        Seq((null, 10.0), (null, 10.0), (null, 10.0), (null, 1000.0)))
      .toDF("g", "v")
    val out = Pipe(df).madOutliers(col("g"), col("v"), 3.0).df
    assert(out.count() == 7L, "null-group rows must pass through")
    val nullRows = out.where(col("g").isNull)
      .select(col("v"), col("is_outlier"))
      .collect().map(r => r.getDouble(0) -> r.getBoolean(1)).toMap
    assert(nullRows(1000.0) && !nullRows(10.0), nullRows.toString)
  }

  test("madOutliers approx regime agrees with exact away from the " +
      "boundary and bounds its aggregation state") {
    // integer-ish values with wide margins: inliers hug the median,
    // planted outliers sit 100×MAD away — far beyond approx rank error
    val rows = (0 until 400).map(i => ("g" + (i % 4), (i % 7 + 10).toDouble,
      i.toLong)) ++ Seq(("g0", 10000.0, 9001L), ("g2", -10000.0, 9002L))
    val df = rows.toDF("g", "v", "id")
    def flags(approx: Boolean) =
      Pipe(df).madOutliers(col("g"), col("v"), 3.0, approx = approx)
        .df.where(col("is_outlier")).select(col("id"))
        .collect().map(_.getLong(0)).toSet
    val exactF = flags(approx = false)
    val approxF = flags(approx = true)
    assert(exactF == approxF, s"exact=$exactF approx=$approxF")
    assert(exactF.contains(9001L) && exactF.contains(9002L))
    // regime split is real: approx plans ApproximatePercentile state,
    // exact plans the buffering Percentile aggregate
    val approxPlan = Pipe(df).madOutliers(col("g"), col("v"), 3.0,
      approx = true).df.queryExecution.executedPlan.toString
    assert(approxPlan.contains("approx_percentile") ||
      approxPlan.contains("percentile_approx"), approxPlan.take(1500))
  }

  // ---- temperature rate floor -------------------------------------------
  test("temperature rebalancing keeps >=1% of a group that would floor " +
      "to 0% (head groups are reweighted, never deleted)") {
    // big/small = 40000: at α=0.5 the derived rate is
    // floor(100·(1/40000)^0.5) = floor(0.5) = 0 → clamped to 1
    val rows = (0L until 40000L).map(i => ("big", i)) :+ (("small", 90001L))
    val df = rows.toDF("lang", "id")
    val kept = Pipe(df).temperatureSampleByHash(col("lang"), 0.5, col("id"))
      .df.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse("small", 0L) == 1L)
    val big = kept.getOrElse("big", 0L)
    // ~1% of 40000 under the md5 bucket; the old floor-to-0 behavior
    // deleted the group outright
    assert(big > 0L, "largest group must survive rebalancing")
    assert(big < 2000L, s"rate clamp should keep ~1%, kept $big")
  }

  // ---- CDC_CHUNKS arity -------------------------------------------------
  test("dialect CDC_CHUNKS rejects 2- and 3-arg forms with a real error") {
    val df = Seq((1L, "abcdefgh")).toDF("id", "t")
    Seq("CDC_CHUNKS(t, 32)", "CDC_CHUNKS(t, 32, 5)").foreach { call =>
      val e = intercept[Exception] {
        graft.piglatin.PigScript.run(spark,
          s"b = FOREACH a GENERATE id, $call AS c;",
          tables = Map("a" -> df)).relation("b").collect()
      }
      assert(e.getMessage != null &&
        e.getMessage.contains("CDC_CHUNKS takes"),
        s"$call -> ${e.getMessage}")
    }
  }
}
