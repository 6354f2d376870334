package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.functions._

import graft.functions.CdcChunksExpr

/** Content-defined chunking for chunk-level dedup of mutable corpora
  * (crawl re-fetches, document revisions, near-identical binary blobs).
  * Boundaries depend on content, not offset — an edit shifts only the
  * chunk it touches, so unchanged regions keep their chunk identity and
  * dedup across revisions. Per-row narrow transform: chunking itself
  * never shuffles; only the chunk-hash dedup aggregation does, and it
  * shuffles (hash, size) pairs — never chunk payloads.
  */
object Cdc {

  /** Split `c` (string or binary) into content-defined chunks.
    * Expected chunk size ≈ minSize + 2^maskBits units. */
  def chunks(c: Column, minSize: Int = 64, maskBits: Int = 8,
             maxSize: Int = 1024): Column =
    column(CdcChunksExpr(expression(c), minSize, maskBits, maxSize))

  /** Chunk table: one row per (id, chunk_idx, chunk). The exploded shape
    * feeds chunk-level dedup (group by chunk hash) and content-addressed
    * chunk stores. */
  def chunkTable(df: DataFrame, idCol: Column, contentCol: Column,
                 minSize: Int = 64, maskBits: Int = 8,
                 maxSize: Int = 1024): DataFrame =
    df.select(idCol.as("id"),
        posexplode(chunks(contentCol, minSize, maskBits, maxSize))
          .as(Seq("chunk_idx", "chunk")))

  /** Storage-dedup accounting over a chunked corpus: logical units
    * (every chunk) vs physical units (distinct chunks by xxhash64+length
    * identity). The aggregation shuffles one (hash, len) pair per chunk,
    * never the chunk bytes. */
  def dedupStats(df: DataFrame, idCol: Column, contentCol: Column,
                 minSize: Int = 64, maskBits: Int = 8,
                 maxSize: Int = 1024): DataFrame = {
    val t = chunkTable(df, idCol, contentCol, minSize, maskBits, maxSize)
      .select(xxhash64(col("chunk")).as("h"), length(col("chunk")).as("len"))
    t.agg(
        count(lit(1)).as("logical_chunks"),
        sum(col("len")).as("logical_units"))
      .crossJoin(
        t.groupBy(col("h"), col("len")).agg(count(lit(1)).as("refs"))
          .agg(count(lit(1)).as("physical_chunks"),
               sum(col("len")).as("physical_units")))
  }
}
