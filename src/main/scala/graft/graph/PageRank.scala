package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank over an edge relation — the link-graph half of web-corpus
  * curation (domain/page authority as a quality prior is a standard
  * pretraining-data signal; the crawl's link structure arrives free with
  * [[graft.text.Html.links]]).
  *
  * Not a reference operator; first-class here because a 100 TB crawl is
  * a graph before it is a corpus.
  *
  * Arithmetic is INTEGER FIXED-POINT (ranks scaled by `scale`,
  * contributions floor-divided) — deliberately, for two properties
  * floats cannot give:
  *  - cross-engine exactness: integer sums are order-independent, so
  *    the DuckDB oracle reproduces every rank bit-for-bit; a double
  *    formulation would diverge on shuffle-dependent summation order.
  *  - run-to-run determinism at cluster scale: identical output under
  *    any partitioning / AQE decision.
  *
  * Per iteration (damping 0.85 as the rational 85/100):
  * {{{
  *   contrib(v) = Σ_{u→v} floor(r_u / outdeg(u))
  *   r'(v)      = floor(scale · 15/100) + floor(85 · contrib(v) / 100)
  * }}}
  * Dangling nodes (no out-edges) contribute nothing — their mass leaks,
  * the simplest deterministic policy (the usual redistribution variant
  * adds a global scalar each iteration; compose it outside if needed).
  * Ranks start at `scale` (= 1.0 per node); magnitudes stay below
  * N·scale, so Long arithmetic is safe to ~9e9 nodes at the default
  * scale of 1e9.
  *
  * Scale design: each iteration is the canonical join–aggregate pair —
  * edges join current ranks on `src` (both sides hash-partitioned on
  * the same key, so consecutive iterations reuse the edge shuffle), a
  * partial-aggregated `groupBy(dst).sum`. Each iteration's rank table
  * (N rows, two longs) is persisted and the previous one released, so
  * lineage stays one iteration deep — no exponential plan growth, no
  * recomputation cascade. Edges are analyzed once and cached by the
  * caller if iterated against repeatedly.
  */
object PageRank {

  /** Run `iterations` rounds; returns `(id, rank)` with ranks in units
    * of 1/`scale`. `edges` needs `src`/`dst` (castable to long);
    * parallel edges count double, self-loops are legal. */
  def pageRank(edges: DataFrame, srcCol: Column, dstCol: Column,
               iterations: Int = 10, scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 0, s"pageRank: iterations >= 0 (got $iterations)")
    require(scale >= 100L, s"pageRank: scale >= 100 (got $scale)")
    val e = edges.select(srcCol.cast("long").as("src"),
                         dstCol.cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Intermediates.track(e)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // outgoing side pre-joined once: (src, dst, deg) — iteration then
    // only joins the current ranks in
    val out = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Intermediates.track(out)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.Intermediates.track(nodes)
    val base = scale * 15L / 100L
    var ranks = nodes.withColumn("rank", lit(scale))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ranks.count()
    // materialize every k-th generation, not every generation: each rank
    // table is referenced ONCE by the next iteration (the contribs join),
    // so lineage between cuts grows LINEARLY — k iterations ride one job
    // with no intermediate cache writes/actions, and the cut bounds both
    // recomputation-on-failure and optimizer plan depth. k is small
    // enough that a retried stage replays at most 3 iterations' shuffles.
    val ckptEvery = 3
    var sinceCut = 0
    var pinnedPrev = ranks
    for (i <- 1 to iterations) {
      val contribs = out.join(ranks, out("src") === ranks("id"))
        .select(col("dst").as("id"), expr("rank div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("contrib"))
      val next = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr("85 * coalesce(contrib, 0L) div 100"))
            .as("rank"))
      sinceCut += 1
      if (sinceCut == ckptEvery || i == iterations) {
        val cut = next
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cut.count() // materialize BEFORE releasing the previous cut
        pinnedPrev.unpersist()
        pinnedPrev = cut
        ranks = cut
        sinceCut = 0
      } else ranks = next
    }
    graft.core.Intermediates.track(ranks)
    ranks
  }
}
