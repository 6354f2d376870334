package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the memory-side half of the canonical
  * 100 TB ANN recipe (IVF-PQ): split each d-dim vector into `m`
  * subvectors, k-means each subspace independently (`k` centroids), and
  * store only the per-subspace nearest-centroid ids. With k ≤ 256 a
  * vector compresses to `m` bytes (64-dim float → 8 bytes at m=8, 32×),
  * so a corpus whose raw embeddings need a parquet scan fits executor
  * MEMORY as codes — the property that makes billion-vector search
  * feasible at all.
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * exact; its squared-L2 distance to every subspace centroid is
  * precomputed ONCE into an m×k table, and each corpus vector's
  * approximate distance is m table lookups summed — no float math per
  * candidate beyond `m` adds.
  *
  * Scale shape: codebooks are driver-trained on a bounded seeded sample
  * (m·k·(d/m) doubles — tiny literals, codegen-inlined); encoding is one
  * narrow corpus map; queries broadcast WITH their distance tables (built
  * on the broadcast side, once per query, never per candidate pair);
  * [[adcTopK]] scans codes flat, [[ivfPqTopK]] restricts the scan to the
  * query's nProbe IVF cells via the same equi-join as
  * [[Similarity.ivfTopKWith]]. Only scored (query × candidate) rows
  * shuffle, partitioned by query, for the top-k window.
  *
  * Cross-engine determinism (same discipline as IVF/centroid oracles):
  * every squared-L2 is a sequential ascending-dim left fold, the ADC sum
  * a sequential ascending-subspace left fold, argmins tie to the LOWEST
  * centroid index — so a DuckDB oracle replays codes and rankings
  * exactly from the same centroid literals.
  */
object Pq {

  /** Per-subspace codebooks: `codebooks(i)(c)` is centroid `c` of
    * subspace `i`, each of length d/m. Plain (non-spherical) k-means —
    * PQ quantizes residual geometry, not direction, so centroids must
    * live where the data lives rather than on the unit sphere. Training
    * is driver-side on the shared bounded seeded sample
    * ([[Similarity.seededSampleVecs]]): O(sample), corpus-size-free. */
  def trainCodebooks(corpus: DataFrame, m: Int = 8, k: Int = 16,
                     vecCol: String = "vec", seed: Long = 42L,
                     sampleSize: Int = 2048,
                     iters: Int = 10): Seq[Seq[Array[Double]]] = {
    require(m > 0 && k > 0, s"m ($m) and k ($k) must be positive")
    val sample = Similarity.seededSampleVecs(corpus, vecCol, sampleSize, seed)
    require(sample.nonEmpty, "empty PQ training sample")
    val dim = sample.head.length
    require(dim % m == 0,
      s"embedding dim $dim is not divisible by m=$m subspaces")
    val ds = dim / m
    (0 until m).map { i =>
      trainCentroidsL2(sample.map(v => v.slice(i * ds, (i + 1) * ds)),
        k, iters, seed + i)
    }
  }

  /** Driver-side plain k-means (L2 assignment, mean update) — the
    * Euclidean sibling of [[Similarity.trainCentroids]], deterministic
    * given the seed; empty clusters keep their previous centroid. */
  private[graft] def trainCentroidsL2(sample: Array[Array[Double]], k: Int,
                                      iters: Int,
                                      seed: Long): Seq[Array[Double]] = {
    require(sample.nonEmpty, "empty centroid-training sample")
    val rnd = new scala.util.Random(seed)
    var cents = rnd.shuffle(sample.toSeq).take(k).map(_.clone()).toArray
    (0 until iters).foreach { _ =>
      val sums = Array.fill(cents.length)(new Array[Double](sample.head.length))
      val counts = new Array[Int](cents.length)
      sample.foreach { v =>
        var best = 0; var bestD = Double.PositiveInfinity
        cents.indices.foreach { j =>
          var d = 0.0; var i = 0
          while (i < v.length) {
            val t = v(i) - cents(j)(i); d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = j }
        }
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.indices.map(j =>
        if (counts(j) == 0) cents(j)
        else sums(j).map(_ / counts(j))).toArray
    }
    cents.toSeq
  }

  /** Squared L2 between an array column and a centroid literal:
    * sequential ascending-dim left fold — (0 + t₀) + t₁ + … with
    * tⱼ = (xⱼ−yⱼ)², the op order every oracle replays (0 + t₀ ≡ t₀ in
    * IEEE, so DuckDB's init-free list_reduce matches). */
  def subDistSq(sub: Column, cent: Array[Double]): Column =
    aggregate(zip_with(sub, lit(cent), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** The m-length code array for a vector: per subspace, the argmin-L2²
    * centroid id with ties to the LOWEST index (the sort-pairs trick of
    * [[Similarity.probeCells]] — a when-chain argmin would double the
    * expression tree per centroid). Narrow, codegen'd; no data moves. */
  def encodeExpr(v: Column, codebooks: Seq[Seq[Array[Double]]]): Column = {
    val ds = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (cb, i) =>
      val sub = slice(v, i * ds + 1, ds)
      val pairs = array(cb.zipWithIndex.map { case (c, ci) =>
        struct(subDistSq(sub, c).as("d"), lit(ci).as("i")) }: _*)
      element_at(transform(array_sort(pairs), p => p.getField("i")), 1)
    }: _*)
  }

  /** (id, codes): the PQ-compressed corpus — m small ints per vector.
    * At scale this is the table you keep hot (or write bucketed) while
    * the raw embeddings stay cold. */
  def encode(corpus: DataFrame, codebooks: Seq[Seq[Array[Double]]],
             idCol: String = "id", vecCol: String = "vec"): DataFrame =
    corpus.select(col(idCol).as("id"),
      encodeExpr(col(vecCol).cast(ArrayType(DoubleType)), codebooks)
        .as("codes"))

  /** The query-side m×k ADC table: entry (i, c) is L2²(query subvector i,
    * centroid c of subspace i). Built once per query row BEFORE the
    * broadcast, so candidates pay only lookups. */
  def adcTableExpr(v: Column, codebooks: Seq[Seq[Array[Double]]]): Column = {
    val ds = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (cb, i) =>
      val sub = slice(v, i * ds + 1, ds)
      array(cb.map(c => subDistSq(sub, c)): _*)
    }: _*)
  }

  /** ADC approximate distance: Σᵢ table(i)(codes(i)) — a sequential
    * ascending-subspace left fold of m table lookups. */
  def adcDist(codes: Column, table: Column): Column =
    aggregate(
      zip_with(codes, table, (c, t) => element_at(t, c + 1)),
      lit(0.0), (acc, v) => acc + v)

  /** Approximate top-k by ADC over the full code table (the flat-scan
    * baseline; see [[ivfPqTopK]] for the cell-restricted scale path).
    * Returns (qid, id, rank) ranked by ascending approximate L2², ties
    * to the lowest id. `queries` must be broadcast-small (the
    * [[Similarity.bruteForceTopK]] contract). */
  def adcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              codebooks: Seq[Seq[Array[Double]]],
              idCol: String = "id", qidCol: String = "qid",
              vecCol: String = "vec"): DataFrame = {
    val coded = encode(graft.dedup.Dedup.widen(corpus), codebooks,
      idCol, vecCol)
    val q = queries.select(col(qidCol).as("qid"),
      adcTableExpr(col(vecCol).cast(ArrayType(DoubleType)), codebooks)
        .as("__tab"))
    val scored = coded.crossJoin(broadcast(q))
      .select(col("qid"), col("id"),
        adcDist(col("codes"), col("__tab")).as("adist"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Residual codebooks for [[ivfPqResidualTopK]]: trained on
    * `v − coarse[cell(v)]` over the shared bounded seeded sample (cell =
    * max-dot coarse assignment with min-index ties, the
    * [[Similarity.probeCells]] rule mirrored driver-side). Residuals are
    * what the classic IVF-PQ actually quantizes — they concentrate near
    * the origin once the coarse structure is removed, so the same m×k
    * budget spends its levels on fine detail instead of re-encoding
    * which cluster a vector sits in. */
  def residualCodebooks(corpus: DataFrame, coarse: Seq[Array[Double]],
                        m: Int = 8, k: Int = 16, vecCol: String = "vec",
                        seed: Long = 42L, sampleSize: Int = 2048,
                        iters: Int = 10): Seq[Seq[Array[Double]]] = {
    require(m > 0 && k > 0, s"m ($m) and k ($k) must be positive")
    val sample = Similarity.seededSampleVecs(corpus, vecCol, sampleSize, seed)
    require(sample.nonEmpty, "empty PQ training sample")
    val dim = sample.head.length
    require(dim % m == 0,
      s"embedding dim $dim is not divisible by m=$m subspaces")
    def cellOf(v: Array[Double]): Int = {
      var best = 0; var bestDot = Double.NegativeInfinity
      coarse.indices.foreach { j =>
        var d = 0.0; var i = 0
        while (i < v.length) { d += v(i) * coarse(j)(i); i += 1 }
        if (d > bestDot) { bestDot = d; best = j }
      }
      best
    }
    val residuals = sample.map { v =>
      val c = coarse(cellOf(v))
      Array.tabulate(v.length)(i => v(i) - c(i))
    }
    val ds = dim / m
    (0 until m).map { i =>
      trainCentroidsL2(residuals.map(r => r.slice(i * ds, (i + 1) * ds)),
        k, iters, seed + i)
    }
  }

  /** A column holding `coarse` as array<array<double>> so a row's cell
    * centroid is one element_at lookup. */
  private def coarseLit(coarse: Seq[Array[Double]]): Column =
    array(coarse.map(c => lit(c)): _*)

  /** Residual-encoded IVF-PQ (the classic configuration): corpus codes
    * quantize `v − coarse[cell]`, the query builds one ADC table PER
    * PROBED CELL from its own residual against that cell (m·k·nProbe
    * table entries instead of m·k — the price of residual accuracy).
    * The residual vectors are BOUND as lambda variables before
    * encode/table construction: higher-order functions evaluate
    * interpreted, so an unbound residual expression would re-run the
    * subtraction per (subspace, centroid) probe — the O(d²)
    * re-evaluation class this codebase keeps finding. */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        coarse: Seq[Array[Double]],
                        codebooks: Seq[Seq[Array[Double]]], nProbe: Int = 4,
                        idCol: String = "id", qidCol: String = "qid",
                        vecCol: String = "vec"): DataFrame = {
    val cl = coarseLit(coarse)
    val cVecs = graft.dedup.Dedup.widen(corpus)
      .select(col(idCol).as("id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("cv"))
      .withColumn("cell",
        element_at(Similarity.probeCells(col("cv"), coarse, 1), 1))
    val coded = cVecs.select(col("id"), col("cell"),
      element_at(transform(
        array(zip_with(col("cv"), element_at(cl, col("cell") + 1),
          (x, y) => x - y)),
        r => encodeExpr(r, codebooks)), 1).as("codes"))
    val probed = queries.select(col(qidCol).as("qid"),
        col(vecCol).cast(ArrayType(DoubleType)).as("qv"))
      .select(col("qid"),
        explode(Similarity.probeCells(col("qv"), coarse, nProbe))
          .as("cell"), col("qv"))
      .select(col("qid"), col("cell"),
        element_at(transform(
          array(zip_with(col("qv"), element_at(cl, col("cell") + 1),
            (x, y) => x - y)),
          r => adcTableExpr(r, codebooks)), 1).as("__tab"))
    val scored = coded.join(broadcast(probed), Seq("cell"))
      .select(col("qid"), col("id"),
        adcDist(col("codes"), col("__tab")).as("adist"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF-PQ: candidate generation by IVF cell equi-join (the
    * [[Similarity.ivfTopKWith]] shape — corpus assigned to its nearest
    * coarse centroid, query probes its nProbe closest cells), scoring by
    * ADC over the candidates. This is the billion-vector configuration:
    * the corpus moves nowhere, candidates are a cell-sized fraction, and
    * each candidate costs m table lookups. Codes here quantize the raw
    * vectors — ONE shared query table; [[ivfPqResidualTopK]] is the
    * classic residual-encoded configuration (per-cell query tables,
    * m·k·nProbe entries, finer quantization for the same budget). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                coarse: Seq[Array[Double]],
                codebooks: Seq[Seq[Array[Double]]], nProbe: Int = 4,
                idCol: String = "id", qidCol: String = "qid",
                vecCol: String = "vec"): DataFrame = {
    val cVecs = graft.dedup.Dedup.widen(corpus)
      .select(col(idCol).as("id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("cv"))
    val coded = cVecs.select(col("id"),
      element_at(Similarity.probeCells(col("cv"), coarse, 1), 1).as("cell"),
      encodeExpr(col("cv"), codebooks).as("codes"))
    val probed = queries.select(col(qidCol).as("qid"),
        col(vecCol).cast(ArrayType(DoubleType)).as("qv"))
      .select(col("qid"),
        explode(Similarity.probeCells(col("qv"), coarse, nProbe))
          .as("cell"),
        adcTableExpr(col("qv"), codebooks).as("__tab"))
    // broadcast for the same reason as ivfTopKWith: a shuffle join keyed
    // on `cell` (≤ nCells distinct values) funnels the corpus into
    // nCells reducers
    val scored = coded.join(broadcast(probed), Seq("cell"))
      .select(col("qid"), col("id"),
        adcDist(col("codes"), col("__tab")).as("adist"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").asc, col("id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
