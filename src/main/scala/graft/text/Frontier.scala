package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fetch-schedule assignment for a crawl frontier — the politeness step
  * closing the crawl loop (WARC → links → canon → blocklist → robots
  * gate → crawl-delay → THIS): per host, eligible URLs are laid out in
  * fetch slots `delay` seconds apart, so a fleet of fetchers consuming
  * slot order never exceeds one request per delay per host while
  * saturating across hosts.
  *
  * Determinism contract (the md5-sampler discipline): slots are
  * assigned by `row_number` over a TOTAL per-host order (the url — the
  * caller must pass a unique-per-host column), and offsets are computed
  * in integer milliseconds (`slot · round(delay·1000)`), so schedules
  * reproduce across engines, retries and partitionings, and the oracle
  * can replay them exactly.
  *
  * Plan shape: ONE exchange on host + an in-partition sort (the
  * sessionize shape) — no driver state, no per-host collect; 100 TB
  * frontiers scale with the host-key shuffle. A pathologically hot host
  * is a DATA property (its slots are serialized by politeness anyway —
  * parallelism beyond one fetch per delay is exactly what the schedule
  * must prevent), not a skew defect.
  */
object Frontier {

  /** Append (`slot`, `fetch_at_ms`) to `frontier`: slot = 0-based fetch
    * index within `host` in `url` order; fetch_at_ms = slot ·
    * round(coalesce(delaySec, defaultDelaySec)·1000) — the ms offset
    * from the host's crawl start. NULL hosts pass through with NULL
    * slots (unroutable rows are the caller's filter to make, loudly
    * visible, never silently dropped). */
  def schedule(frontier: DataFrame, host: Column, url: Column,
               delaySec: Column, defaultDelaySec: Double = 1.0)
      : DataFrame = {
    require(defaultDelaySec >= 0,
      s"Frontier.schedule: defaultDelaySec must be >= 0, got $defaultDelaySec")
    val clash = frontier.columns.toSet.intersect(Set("slot", "fetch_at_ms"))
    require(clash.isEmpty, "Frontier.schedule: input already has " +
      s"reserved column(s) ${clash.mkString(", ")}")
    val w = Window.partitionBy(host).orderBy(url.asc)
    val delayMs = round(coalesce(
      delaySec.cast(org.apache.spark.sql.types.DoubleType),
      lit(defaultDelaySec)) * 1000.0)
      .cast(org.apache.spark.sql.types.LongType)
    frontier
      .withColumn("slot",
        when(host.isNotNull,
          row_number().over(w).cast(org.apache.spark.sql.types.LongType)
            - 1L))
      .withColumn("fetch_at_ms", col("slot") * delayMs)
  }
}
