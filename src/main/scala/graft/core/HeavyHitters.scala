package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Heavy hitters: the top-k most frequent values of a column — the
  * frequent-items audit every curation pipeline runs (dominant domains,
  * boilerplate tokens, hot keys before a join). Companion to
  * [[Profile]] and split the same way:
  *
  *  - [[exact]] — full `groupBy(value).count` + deterministic top-k.
  *    One shuffle keyed by value (partial aggregation combines
  *    map-side, so the exchange carries one row per distinct value per
  *    partition, not one per occurrence) and a TakeOrdered for the
  *    top-k — never a single-partition global sort. DuckDB-oracled.
  *  - [[sketch]] — 100 TB posture when even the distinct-value shuffle
  *    is too wide (think: URL column, billions of distincts). Per-
  *    partition Misra–Gries summaries of `capacity` counters, merged
  *    through one tiny shuffle of ≤ capacity rows per partition.
  *    Deterministic (no RNG), mergeable, with the classic guarantee:
  *    every true count n_v is bounded by
  *    `est_min ≤ n_v ≤ est_max = est_min + Σ_p dec_p`, and
  *    `Σ_p dec_p ≤ n / (capacity + 1)` — so any value with frequency
  *    above n/(capacity+1) is guaranteed to surface.
  *
  * Values are compared as strings (cast on the way in) so one schema
  * serves every column type; ties break on the value itself, so output
  * is deterministic across engines and partitionings.
  */
object HeavyHitters {

  /** Exact top-k: `(value, cnt)`, ordered by count desc then value —
    * the deterministic tie-break that makes LIMIT k reproducible. */
  def exact(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    require(k > 0, s"HeavyHitters.exact: k must be positive (got $k)")
    df.select(valueCol.cast("string").as("value"))
      .where(col("value").isNotNull)
      .groupBy("value").agg(count(lit(1)).as("cnt"))
      // orderBy + limit plans as TakeOrderedAndProject: per-partition
      // top-k, k rows to the driver — no global sort materializes
      .orderBy(col("cnt").desc, col("value").asc)
      .limit(k)
  }

  /** Misra–Gries sketched top-k: `(value, est_min, est_max)` ordered by
    * `est_min` desc then value. `capacity` counters per partition; the
    * merged global error (Σ per-partition decrement rounds) is the
    * uniform `est_max - est_min` gap. Summaries — not rows — cross the
    * one exchange, so the shuffle is ≤ capacity × partitions rows no
    * matter how many distinct values the column holds. */
  def sketch(df: DataFrame, valueCol: Column, k: Int,
             capacity: Int = 4096): DataFrame = {
    require(k > 0, s"HeavyHitters.sketch: k must be positive (got $k)")
    require(capacity >= k,
      s"HeavyHitters.sketch: capacity $capacity < k $k — the sketch " +
        "cannot hold enough counters to answer the query")
    val spark = df.sparkSession
    import spark.implicits._
    val values = df.select(valueCol.cast("string").as("value"))
      .where(col("value").isNotNull).as[String]
    // per-partition Misra–Gries; one extra (null, dec) record carries
    // the partition's decrement-round count (its undercount bound)
    val partials = values.mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      var dec = 0L
      it.foreach { v =>
        counters.get(v) match {
          case Some(c) => counters.update(v, c + 1)
          case None if counters.size < capacity => counters.update(v, 1L)
          case None => // decrement-all round: the MG eviction step
            dec += 1
            val dead = mutable.ArrayBuffer.empty[String]
            counters.foreach { case (kk, c) =>
              if (c == 1L) dead += kk else counters.update(kk, c - 1)
            }
            dead.foreach(counters.remove)
        }
      }
      counters.iterator.map { case (v, c) => (v, c) } ++
        Iterator.single((null: String, dec))
    }.toDF("value", "cnt")
    // merge: per-value count sums; the summed decrement rounds bound
    // every value's undercount uniformly (present or evicted alike)
    val totalDec = partials.where(col("value").isNull)
      .agg(sum("cnt").as("__dec"))
    partials.where(col("value").isNotNull)
      .groupBy("value").agg(sum("cnt").as("est_min"))
      .crossJoin(broadcast(totalDec)) // 1-row stat frame
      .select(col("value"), col("est_min"),
        (col("est_min") + col("__dec")).as("est_max"))
      .orderBy(col("est_min").desc, col("value").asc)
      .limit(k)
  }
}
