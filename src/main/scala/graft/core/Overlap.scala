package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-corpus overlap accounting — "how much of corpus B is already in
  * corpus A?" (snapshot-vs-snapshot crawl audits, source-vs-source token
  * sharing, eval-vs-train key leakage at the set level). Two regimes,
  * the Profile/HeavyHitters audit-vs-sketch split:
  *
  *  - [[exact]]: distinct-reduce each side FIRST (map-side combine — the
  *    exchanges carry distinct keys, never row streams), then one
  *    equi-join between the two distinct sets. Oracle-replayable.
  *  - [[sketch]]: one linear pass per side building mergeable Theta/HLL
  *    DataSketches (`hll_sketch_agg`), union estimate via `hll_union`,
  *    intersection by inclusion–exclusion. No join, no distinct state —
  *    two (tiny) sketches cross the wire regardless of corpus size; the
  *    regime a 100 TB × 100 TB comparison needs. Estimates carry HLL
  *    error, so the contract is spec'd within tolerance, not oracled.
  */
object Overlap {

  /** Exact overlap: one row — n_a, n_b (distinct key counts), n_common,
    * jaccard = n_common / (n_a + n_b − n_common). */
  def exact(a: DataFrame, keyA: Column, b: DataFrame,
            keyB: Column): DataFrame = {
    val da = a.select(keyA.as("k")).where(col("k").isNotNull).distinct()
    val db = b.select(keyB.as("k")).where(col("k").isNotNull).distinct()
    val common = da.join(db, "k").agg(count(lit(1)).as("n_common"))
    da.agg(count(lit(1)).as("n_a"))
      .crossJoin(db.agg(count(lit(1)).as("n_b")))   // 1-row stat frames
      .crossJoin(common)
      // union = 0 ⇔ both inputs empty/all-null: define jaccard as 0.0
      // (ANSI mode would otherwise raise DIVIDE_BY_ZERO) — the sketch()
      // regime's n_union === 0 guard, mirrored
      .withColumn("jaccard",
        when(col("n_a") + col("n_b") - col("n_common") === 0, lit(0.0))
          .otherwise(col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")).cast("double")))
  }

  /** Row-level snapshot diff — WHICH keys were added / removed / changed
    * between two corpus versions (the crawl-refresh audit [[exact]] only
    * set-counts). One full-outer join keyed on the id, comparing md5
    * content fingerprints: the exchanges carry (key, 32-byte
    * fingerprint) pairs, never document bodies, and unchanged rows —
    * the overwhelming majority of a refresh — are filtered before the
    * result materializes. Keys must be unique per version — a duplicate
    * key would multiply through the full-outer join and emit phantom
    * changed/added rows with no error, so by default a bounded
    * duplicate-key probe (groupBy → count>1 → limit(1), the
    * [[graft.dedup.Incremental.exactAppend]] discipline — two tiny
    * actions, the aggregates carry distinct keys only) fails fast with
    * the offending key. Callers that guarantee unique keys upstream can
    * pass `validateUniqueKeys = false` to keep the plan fully lazy.
    * NULL content on a present key diffs null-safely: a NULL↔value flip
    * is `changed` (`<=>`), never silently `unchanged`. */
  def diff(a: DataFrame, keyA: Column, contentA: Column,
           b: DataFrame, keyB: Column, contentB: Column,
           validateUniqueKeys: Boolean = true): DataFrame = {
    val da = a.select(keyA.as("k"), md5(contentA.cast("string")).as("fa"))
      .where(col("k").isNotNull)
    val db = b.select(keyB.as("k2"), md5(contentB.cast("string")).as("fb"))
      .where(col("k2").isNotNull)
    if (validateUniqueKeys) {
      Seq(("a", da.groupBy(col("k")).count()),
          ("b", db.groupBy(col("k2")).count())).foreach { case (side, g) =>
        val dup = g.where(col("count") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"Overlap.diff: duplicate key ${dup.headOption.map(_.get(0))} " +
            s"in side '$side' — keys must be unique per version " +
            "(duplicates multiply through the full-outer join and emit " +
            "phantom diff rows); dedup upstream or pass " +
            "validateUniqueKeys = false if uniqueness is guaranteed")
      }
    }
    da.join(db, col("k") === col("k2"), "full_outer")
      .select(coalesce(col("k"), col("k2")).as("k"),
        when(col("k").isNull, "added")
          .when(col("k2").isNull, "removed")
          .when(!(col("fa") <=> col("fb")), "changed").as("status"))
      .where(col("status").isNotNull)
  }

  /** Sketched overlap: same schema, HLL estimates. `lgK` is the
    * DataSketches log2 bucket count (12 → ~2.5% RSE, 16 KB sketch). */
  def sketch(a: DataFrame, keyA: Column, b: DataFrame, keyB: Column,
             lgK: Int = 12): DataFrame = {
    val sa = a.select(keyA.as("k")).where(col("k").isNotNull)
      .agg(hll_sketch_agg(col("k"), lit(lgK)).as("sk"))
    val sb = b.select(keyB.as("k")).where(col("k").isNotNull)
      .agg(hll_sketch_agg(col("k"), lit(lgK)).as("sk"))
    sa.select(col("sk").as("sk_a"))
      .crossJoin(sb.select(col("sk").as("sk_b")))   // two 1-row frames
      .select(
        hll_sketch_estimate(col("sk_a")).as("n_a"),
        hll_sketch_estimate(col("sk_b")).as("n_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          .as("n_union"))
      // inclusion–exclusion; clamp at 0 (estimates can cross)
      .withColumn("n_common",
        greatest(lit(0L), col("n_a") + col("n_b") - col("n_union")))
      .withColumn("jaccard", when(col("n_union") === 0, lit(0.0))
        .otherwise(col("n_common").cast("double") /
          col("n_union").cast("double")))
      .select(col("n_a"), col("n_b"), col("n_common"), col("jaccard"))
  }
}
