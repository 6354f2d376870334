package graft

import org.apache.spark.sql.functions._
import graft.core.Profile

/** Corpus profiling (core/Profile.scala): exact vs sketch agreement,
  * null accounting, and the plan-shape contract that separates the two
  * regimes (exact pays the multi-DISTINCT Expand; sketch must not). */
class ProfileSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("exact: per-column counts, distincts and ranges match direct aggregation") {
    val p = Profile.exact(docs, Seq("doc_id", "lang", "n_chars"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("doc_id", "lang", "n_chars"))
    val n = docs.count()
    val langs = docs.select("lang").distinct().count()
    val row = p("lang")
    assert(row.getLong(1) === n) // no nulls in the corpus
    assert(row.getLong(2) === 0L)
    assert(row.getLong(3) === langs)
    val ids = p("doc_id")
    assert(ids.getLong(3) === n) // doc_id is unique
    assert(ids.getString(4).toLong <= ids.getString(5).toLong)
  }

  test("exact: nulls are counted, not silently dropped from the profile") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b"), None, None).toDF("v")
    val r = Profile.exact(df, Seq("v")).collect().head
    assert(r.getLong(1) === 2L) // n_nonnull
    assert(r.getLong(2) === 3L) // n_null
    assert(r.getLong(3) === 2L) // n_distinct
  }

  test("sketch agrees with exact within HLL tolerance; quantiles are ordered and in range") {
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val ex = Profile.exact(docs, cols)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val sk = Profile.sketch(docs, cols, rsd = 0.05)
      .collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      val exact = ex(c).toDouble
      val approx = sk(c).getLong(3).toDouble
      // 4×rsd covers ~all of the HLL error distribution
      assert(math.abs(approx - exact) <= math.max(1.0, 4 * 0.05 * exact),
        s"$c: approx $approx vs exact $exact")
    }
    val nc = sk("n_chars")
    val Seq(p25, p50, p75) = Seq(6, 7, 8).map(nc.getDouble)
    assert(p25 <= p50 && p50 <= p75)
    assert(p25 >= nc.getString(4).toDouble && p75 <= nc.getString(5).toDouble)
    // string columns carry null quantiles, not garbage
    assert(sk("lang").isNullAt(6) && sk("lang").isNullAt(7))
  }

  test("plan shape: exact pays Expand for multi-DISTINCT; sketch must stay a single pass") {
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val exPlan = Profile.exact(docs, cols)
      .queryExecution.executedPlan.toString
    val skPlan = Profile.sketch(docs, cols)
      .queryExecution.executedPlan.toString
    assert(exPlan.contains("Expand"), "exact regime plans via Expand")
    assert(!skPlan.contains("Expand"),
      "sketch regime must be one linear pass (no Expand) — the 100 TB contract")
    // both end in partial aggregation before the single-row exchange
    assert(skPlan.contains("HashAggregate") || skPlan.contains("SortAggregate") ||
           skPlan.contains("ObjectHashAggregate"))
  }

  test("unknown column fails fast") {
    intercept[IllegalArgumentException] {
      Profile.exact(docs, Seq("doc_id", "nope"))
    }
  }
}
