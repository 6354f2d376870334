package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity join — the record-linkage /
  * typo-clustering operator a curation pipeline runs over entity names,
  * URLs and OCR'd tokens. All-pairs Levenshtein is O(n²) and dies at any
  * scale; this is the FastSS deletion-neighborhood scheme (Bocek et al.
  * 2007, public): if ed(a,b) = k ≤ d, deleting from each side the ≤k
  * characters its alignment substitutes/inserts/deletes leaves the SAME
  * matched subsequence — so a and b share a member of their ≤d-deletion
  * neighborhoods, and an equi-join on neighborhood variants has EXACT
  * recall. Precision comes from a native `levenshtein` refine (codegen'd,
  * threshold form, early-abandon) on the candidate pairs only.
  *
  * Scale shape: each row explodes into O(len^d) variants, the candidate
  * join is a hash equi-join on a 64-bit variant hash (shuffles longs, not
  * variant strings), and the refine touches candidate pairs only — never
  * the n² cross product. At 100 TB the variant join buckets like any
  * other key join; nothing is driver-side.
  */
object EditDistance {

  /** Deletion-neighborhood of `c` up to radius `d` (the string itself,
    * plus every string reachable by deleting ≤ d characters), as a
    * deduplicated array column built from codegen-friendly HOFs. */
  def deletionVariants(c: Column, d: Int): Column = {
    require(d >= 1 && d <= 2,
      s"edit-distance join supports maxDist 1 or 2 (got $d) — the " +
        "variant blowup is len^d per row; beyond 2 use a different " +
        "filter (n-gram or sketch) first")
    def delOne(s: Column): Column =
      transform(sequence(lit(1), length(s)),
        i => concat(substring(s, lit(1), i - 1),
          substring(s, i + 1, length(s))))
    val d1 = array_distinct(concat(array(c), delOne(c)))
    if (d == 1) d1
    else array_distinct(flatten(transform(d1,
      s => concat(array(s), delOne(s)))))
  }

  /** Similarity join: pairs (l, r) with levenshtein ≤ maxDist. Output
    * columns `a`, `b`, `dist`, one row per pair. `selfPairs` keeps only
    * a < b (the self-join convention: unordered distinct pairs, no
    * identity rows). */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                lCol: String, rCol: String, maxDist: Int,
                selfPairs: Boolean = false): DataFrame = {
    // the distinct's post-shuffle partitions are sized by AQE from BYTE
    // counts, but every surviving row then pays the len^d variant
    // explode, the candidate join and the levenshtein refine — CPU costs
    // invisible to byte-based coalescing. A small input therefore
    // collapses the whole refine pipeline onto ONE task (measured: a
    // single 5.9 s CPU-bound task at sf0.1). Re-spread to cluster width
    // (defaultParallelism — scale-adaptive, not a constant) before the
    // multiplying work; the re-shuffled rows are bare distinct names, so
    // the extra exchange is noise at any scale.
    // NOTE the repartition key is xxhash64(name), NOT the name itself: a
    // repartition on the bare column is provably redundant over the
    // distinct's own hash partitioning, so Catalyst ELIMINATES it and
    // AQE's byte-based coalescing re-collapses the tiny side to one
    // partition again. The distinct hash key keeps the exchange alive
    // while spreading identically.
    val width = left.sparkSession.sparkContext.defaultParallelism
    // pin only in the COLLAPSE regime (ADVICE r09): AQE merges post-
    // shuffle partitions below the advisory byte size, so the single-
    // task hazard exists only while the estimated input is smaller than
    // width × advisory. An already-big side skips the extra exchange —
    // its distinct spreads naturally and stays spread.
    val advisory = left.sparkSession.conf
      .get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    val advisoryBytes =
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(advisory)
    def pinIfSmall(df: DataFrame, keys: Column*): DataFrame =
      if (df.queryExecution.optimizedPlan.stats.sizeInBytes <
          BigInt(width.toLong) * advisoryBytes)
        df.repartition(width, keys: _*)
      else df
    val lv = pinIfSmall(
        left.select(col(lCol).as("a")).where(col("a").isNotNull)
          .distinct(), xxhash64(col("a")))
      .select(col("a"),
        explode(deletionVariants(col("a"), maxDist)).as("__v"))
      .select(col("a"), xxhash64(col("__v")).as("__vh"))
    val rv = pinIfSmall(
        right.select(col(rCol).as("b")).where(col("b").isNotNull)
          .distinct(), xxhash64(col("b")))
      .select(col("b"),
        explode(deletionVariants(col("b"), maxDist)).as("__v"))
      .select(col("b"), xxhash64(col("__v")).as("__vh"))
    val ordered = if (selfPairs) lv("a") < rv("b") else lit(true)
    // same byte-blindness at the candidate-dedup exchange: the pairs are
    // small but each then pays the levenshtein refine. Pin the exchange
    // to cluster width ourselves — the distinct's aggregate reuses this
    // exact hash distribution, so it costs no extra shuffle. This pin is
    // UNCONDITIONAL: a join's size estimate is a row-product guess with
    // no relation to the actual surviving pairs, so the pinIfSmall guard
    // (sound on the scanned inputs) would be deciding from noise here —
    // and this exchange is exactly where the r09 single-task collapse
    // re-forms if unpinned.
    lv.join(rv, lv("__vh") === rv("__vh") && ordered)
      .select(col("a"), col("b"))
      .repartition(width, col("a"), col("b"))
      .distinct()
      // threshold form early-abandons rows whose distance exceeds
      // maxDist (returns -1) — the refine is len·maxDist per pair, not
      // len² ; length gap > maxDist can't be within distance, skip free
      .where(abs(length(col("a")) - length(col("b"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("a"), col("b"), maxDist))
      .where(col("dist") >= 0 && (if (selfPairs) col("dist") >= 1
        else lit(true)))
  }

  /** Unordered distinct near-pairs within one relation's column. */
  def fuzzySelfJoin(df: DataFrame, c: String, maxDist: Int): DataFrame =
    fuzzyJoin(df, df, c, c, maxDist, selfPairs = true)
}
