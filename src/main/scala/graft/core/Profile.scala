package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Corpus profiling: per-column audit statistics over an arbitrary
  * DataFrame — the "what is actually in this 100 TB corpus" pass every
  * curation pipeline starts with (null ratios, cardinalities, value
  * ranges, length quantiles). The reference's closest surface is
  * DESCRIBE (schema only); this adds the data-side half as first-class
  * relational output so profiles compose (store, diff across snapshots,
  * gate downstream stages on them).
  *
  * Two regimes, deliberately split:
  *
  *  - [[exact]] — audit posture. `count(DISTINCT c)` per column makes
  *    Catalyst plan an Expand (input ×(k+1) for k distinct aggs), so the
  *    scan cost grows with the number of profiled columns. Exact answers,
  *    DuckDB-oracle-able, intended for slices / moderate scale.
  *  - [[sketch]] — 100 TB posture. One aggregation pass, NO Expand:
  *    HyperLogLog++ cardinalities (`approx_count_distinct`, mergeable
  *    partial aggregation so the shuffle carries sketches, not rows) and
  *    KLL-style quantiles (`percentile_approx`) for numeric columns.
  *    Accuracy is a parameter, cost is one linear scan regardless of
  *    column count.
  *
  * Both emit the same long-format schema (one row per profiled column)
  * so callers can swap regimes without touching downstream code; sketch
  * adds p25/p50/p75. min/max are cast to string so heterogeneous column
  * types share one schema — profiled columns must therefore have a
  * deterministic binary string form (numerics, ASCII-ish codes; binary
  * ordering of non-ASCII text differs across engines, so profile a
  * `length(text)` derivation instead of raw prose).
  */
object Profile {

  /** Exact per-column profile: n_nonnull / n_null / n_distinct /
    * min_val / max_val, one output row per column. Single `agg` call —
    * one job — but the multi-DISTINCT Expand multiplies scanned rows by
    * |cols|+1; use [[sketch]] when the input is large. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.exact: no columns given")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Profile.exact: unknown columns $missing")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
          countDistinct(col(c)).as(s"__nd_$c"),
          min(col(c)).cast("string").as(s"__mn_$c"),
          max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("col_name"),
             col(s"__nn_$c").as("n_nonnull"),
             (col("__n") - col(s"__nn_$c")).as("n_null"),
             col(s"__nd_$c").as("n_distinct"),
             col(s"__mn_$c").as("min_val"),
             col(s"__mx_$c").as("max_val"))
    }
    one.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  /** Sketched profile: identical shape to [[exact]] plus p25/p50/p75
    * (numeric columns; null otherwise). `n_distinct` is HLL++ with
    * relative standard deviation `rsd`; quantiles carry
    * `percentile_approx`'s rank-error bound at `pctAccuracy`. One
    * aggregation pass, no Expand, partials merge map-side — the plan a
    * 1000-executor profile of a 100 TB table needs. */
  def sketch(df: DataFrame, cols: Seq[String], rsd: Double = 0.05,
             pctAccuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "Profile.sketch: no columns given")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Profile.sketch: unknown columns $missing")
    val numeric: Set[String] = df.schema.fields
      .collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }.toSet
    val aggs: Seq[Column] = cols.flatMap { c =>
      val pq =
        if (numeric(c))
          percentile_approx(col(c).cast("double"),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(pctAccuracy))
        else lit(null).cast("array<double>")
      Seq(count(col(c)).as(s"__nn_$c"),
          approx_count_distinct(col(c), rsd).as(s"__nd_$c"),
          min(col(c)).cast("string").as(s"__mn_$c"),
          max(col(c)).cast("string").as(s"__mx_$c"),
          pq.as(s"__pq_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("col_name"),
             col(s"__nn_$c").as("n_nonnull"),
             (col("__n") - col(s"__nn_$c")).as("n_null"),
             col(s"__nd_$c").as("n_distinct"),
             col(s"__mn_$c").as("min_val"),
             col(s"__mx_$c").as("max_val"),
             element_at(col(s"__pq_$c"), 1).as("p25"),
             element_at(col(s"__pq_$c"), 2).as("p50"),
             element_at(col(s"__pq_$c"), 3).as("p75"))
    }
    one.select(explode(array(structs: _*)).as("p")).select("p.*")
  }
}
