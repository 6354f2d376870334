package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Incremental (append-path) deduplication.
  *
  * A real 100 TB corpus APPENDS: yesterday's 100 TB plus today's 100 GB
  * shard. Recomputing `dedup(corpus ∪ Δ)` from scratch rescans the
  * world; the incremental path instead keeps a persisted INDEX — the
  * content fingerprints (exact) or shingle sets + banded signatures
  * (MinHash) — and processes a new shard by joining Δ against the index,
  * touching only |index| + |Δ| rows and never the old corpus text.
  *
  * Equivalence contract (spec-asserted):
  *   exact:   `exactAppend(exactIndex(C), Δ) ≡ exactIndex(C ∪ Δ)`
  *   minhash: `minhashLsh(C ∪ Δ).pairs ≡ minhashLsh(C).pairs ∪
  *             minhashAppend(index(C), Δ).newPairs`  (disjoint id sets)
  * — the append step emits exactly the pairs that involve at least one
  * Δ document; old–old pairs were already emitted when the index was
  * built, which is what "never rescan the old corpus" means.
  *
  * Scale shape: the exact index is fp-keyed (one row per distinct
  * content, far smaller than the corpus) and merges with one shuffle on
  * fp. The MinHash index is metadata-only in the hot join — Δ's banded
  * signatures equi-join the indexed ones on (band, bh); shingle sets
  * re-attach to SURVIVING candidates only (the late-fetch rule). With
  * the index tables written bucketed-by-key, the per-shard join can
  * avoid shuffling the index side entirely.
  */
object Incremental {

  // ---- exact ---------------------------------------------------------------
  /** The exact-dedup index of a corpus: (fp, keep_id, dup_cnt) — the
    * [[Dedup.exact]] output IS the index. */
  def exactIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.exact(df, idCol, textCol)

  /** Fold a delta shard into an exact index WITHOUT rescanning the old
    * corpus: dedup Δ alone, then merge the two fp-keyed tables (min
    * winner id, summed duplicate counts) with one shuffle on fp.
    *
    * Re-ingesting rows already in the index would silently inflate
    * `dup_cnt` (and can flip `keep_id`), so by default a bounded
    * limit(1) probe joins Δ ids against the index's keep_id set and
    * fails fast on overlap — the same contract [[minhashAppend]]
    * enforces. (The index only records winner ids, so a re-ingested
    * former DUPLICATE is undetectable from the index alone; the probe
    * catches the common whole-shard re-ingestion case, where winners
    * reappear too.) Callers that guarantee fresh ids can skip it. */
  def exactAppend(index: DataFrame, delta: DataFrame,
                  idCol: String, textCol: String,
                  validateDisjoint: Boolean = true): DataFrame = {
    if (validateDisjoint) {
      val overlap = index.select(col("keep_id").as("id"))
        .join(delta.select(col(idCol).as("id")), Seq("id"))
        .limit(1).collect()
      require(overlap.isEmpty,
        s"exactAppend: delta id ${overlap.headOption.map(_.get(0))} " +
          "already exists in the index — delta shards must carry fresh " +
          "ids (re-ingestion would double-count dup_cnt; rebuild or " +
          "remove the old rows from the index first)")
    }
    index.select(col("fp"), col("keep_id"), col("dup_cnt"))
      .unionByName(Dedup.exact(delta, idCol, textCol))
      .groupBy(col("fp"))
      .agg(min(col("keep_id")).as("keep_id"),
        sum(col("dup_cnt")).cast(LongType).as("dup_cnt"))
  }

  // ---- MinHash + LSH -------------------------------------------------------
  /** The persisted state of the MinHash path: the shingle sets (refine
    * side) and the banded signatures (candidate side). Both id-keyed;
    * `bands` carries no arrays, so the per-shard candidate join stays
    * metadata-only. */
  final case class MinhashIndex(shingles: DataFrame, bands: DataFrame)

  /** Build the index for a corpus (same signature/band formulas as
    * [[Dedup.minhashLsh]] — shared code, so batch and incremental can
    * never drift apart). */
  def minhashIndex(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 32, bands: Int = 8,
                   shingleN: Int = 3): MinhashIndex = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val sh = Dedup.hashedShingleDF(df, idCol, textCol, shingleN)
    MinhashIndex(sh, Dedup.bandedSignatures(sh, numHashes, bands))
  }

  /** Dedup a delta shard against index ∪ Δ: returns (newPairs, updated
    * index). `newPairs` = every near-dup pair with ≥1 Δ side — Δ×old
    * via the index join, Δ×Δ via the self join — refined with the exact
    * Jaccard over the stored shingle sets. The old corpus TEXT is never
    * read; parameters must match the ones the index was built with. */
  def minhashAppend(index: MinhashIndex, delta: DataFrame,
                    idCol: String, textCol: String,
                    numHashes: Int = 32, bands: Int = 8,
                    threshold: Double = 0.7,
                    shingleN: Int = 3,
                    validateDisjoint: Boolean = true): (DataFrame, MinhashIndex) = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val dSh = graft.core.Intermediates.track(
      Dedup.hashedShingleDF(delta, idCol, textCol, shingleN)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // a delta id already present in the index would silently DUPLICATE
    // refine rows (two shingle rows per id side) — fail fast instead.
    // One bounded probe (limit 1 against the id columns); callers that
    // guarantee disjointness externally can skip it
    if (validateDisjoint) {
      val overlap = index.shingles.select(col("id"))
        .join(dSh.select(col("id")), Seq("id")).limit(1).collect()
      require(overlap.isEmpty,
        s"minhashAppend: delta id ${overlap.headOption.map(_.get(0))} " +
          "already exists in the index — delta shards must carry fresh " +
          "ids (re-ingestion requires rebuilding or first removing the " +
          "old rows from the index)")
    }
    val dBands = graft.core.Intermediates.track(
      Dedup.bandedSignatures(dSh, numHashes, bands)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // candidate join: Δ bands vs (index ∪ Δ) bands — every emitted pair
    // has a Δ left side by construction, so old–old pairs never form.
    // At shard scale the Δ side is small: AQE broadcasts it and the
    // index side is scanned once without a shuffle.
    val allBands = index.bands.unionByName(dBands)
    val cands = dBands.as("l").join(allBands.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh"))
      .where(col("l.id") =!= col("r.id"))
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"))
      .distinct()
    // the refine feeds allSh into TWO join sides: persist it so the
    // (array-heavy) index shingle parquet decodes once, not twice — the
    // same reason minhashLsh persists its shingle frame before the
    // self-join (batch and append keep identical cache discipline)
    val allSh = graft.core.Intermediates.track(
      index.shingles.unionByName(dSh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val pairs = cands
      .join(allSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(allSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
    (pairs, MinhashIndex(allSh, allBands))
  }

  // ---- index persistence ---------------------------------------------------
  /** Signature-algorithm version baked into every persisted index. An
    * index banded under a different per-permutation mix (e.g. the
    * pre-splitmix64 xorshift era) produces (band, bh) keys that match
    * NOTHING from the current mix — the append join would silently drop
    * every delta-vs-old pair. Bump this whenever [[graft.functions
    * .XorshiftMinhash]]'s mixing (or the shingle hash / band formula)
    * changes, and the load path below fails fast instead. */
  private[dedup] val SignatureVersion = "minhash-splitmix64-v2"
  private val MetaFile = "_meta"

  /** Persist a MinHash index under `dir` (overwrite = the post-append
    * snapshot replaces the pre-append one). Bucketing both tables by id
    * would additionally pre-shuffle the refine side; plain parquet keeps
    * the layout portable. A `_meta` stamp records the signature-algorithm
    * version so a later load under a changed mix fails fast rather than
    * silently matching nothing (same CodecVersion discipline as
    * [[graft.core.ModelStore]]). */
  def saveMinhashIndex(index: MinhashIndex, dir: String): Unit = {
    index.shingles.write.mode("overwrite").parquet(s"$dir/shingles")
    index.bands.write.mode("overwrite").parquet(s"$dir/bands")
    val conf = index.shingles.sparkSession.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(s"$dir/$MetaFile")
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, true)
    try out.write(SignatureVersion.getBytes("UTF-8")) finally out.close()
  }

  /** Reload a persisted MinHash index (plain parquet scans — prunable,
    * and the candidate join reads only (id, band, bh)). Fails fast when
    * the stored signature version differs from the current one — or is
    * absent (a pre-stamp index from the xorshift era): appending with a
    * mismatched mix would band the delta into a key space the index
    * never uses and silently emit zero delta-vs-old pairs. */
  def loadMinhashIndex(spark: SparkSession, dir: String): MinhashIndex = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(s"$dir/$MetaFile")
    val fs = path.getFileSystem(conf)
    val stored =
      if (fs.exists(path)) {
        val in = fs.open(path)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      } else "<missing>"
    require(stored == SignatureVersion,
      s"loadMinhashIndex: index at $dir was written with signature " +
        s"version '$stored' but this build uses '$SignatureVersion' — " +
        "its (band, bh) keys would match nothing and every delta-vs-old " +
        "near-dup pair would be silently dropped; rebuild the index with " +
        "minhashIndex on the current code")
    MinhashIndex(spark.read.parquet(s"$dir/shingles"),
      spark.read.parquet(s"$dir/bands"))
  }
}
