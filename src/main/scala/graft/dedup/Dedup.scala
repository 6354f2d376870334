package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.text.TextOps

/** Corpus deduplication at 100 TB scale (SURVEY.md §2 rows 57–61).
  *
  * Every strategy follows the same scale shape: per-row signature (narrow,
  * codegen'd) → bucket key → shuffle ONLY on the bucket key → candidate
  * pairs inside buckets → exact refine. Never O(n²); the only wide ops are
  * equi-joins/groupBys on bucket keys, which AQE can re-plan for skew.
  */
object Dedup {

  // ---- exact dedup (hash groupBy) -----------------------------------------
  /** Exact dedup on normalized content: one shuffle on the md5 key, keeps
    * the smallest id per group (deterministic winner). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  // ---- shingling -----------------------------------------------------------
  /** Distinct word n-gram shingles (the MinHash/Jaccard universe). Short
    * docs (< n tokens) collapse to a single whole-doc shingle. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Exact Jaccard between two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0)).otherwise(
      size(array_intersect(a, b)).cast(DoubleType) /
        size(array_union(a, b)).cast(DoubleType))

  // ---- MinHash + LSH -------------------------------------------------------
  /** k-permutation MinHash signature as an array<long>: sig[i] =
    * min over shingles of hash_i(shingle). One pass over the shingle array
    * per permutation, all inside codegen — no UDF, no shuffle. */
  def minhashSignature(shingleCol: Column, k: Int = 32): Column =
    array((0 until k).map(i =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(i))))): _*)

  /** MinHash+LSH near-duplicate pairs.
    *
    * bands×rows decomposition of the signature: docs sharing ANY band
    * bucket become candidates (shuffle on (band, bandHash) only — the
    * standard sub-quadratic LSH join), then exact Jaccard refine.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.7, shingleN: Int = 3): DataFrame = {
    val rows = numHashes / bands
    val sh = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
    val sig = sh.withColumn("sig", minhashSignature(col("sh"), numHashes))
    // band hash = hash of the signature slice; explode to (id, band, bh)
    val banded = sig.select(col("id"), col("sh"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows))): _*)).as(Seq("band", "bh")))
    val l = banded.select(col("id").as("id_a"), col("sh").as("sh_a"),
      col("band"), col("bh"))
    val r = banded.select(col("id").as("id_b"), col("sh").as("sh_b"),
      col("band"), col("bh"))
    l.join(r, Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .groupBy(col("id_a"), col("id_b"))          // dedupe multi-band hits
      .agg(max(col("jaccard")).as("jaccard"))
  }

  // ---- SimHash -------------------------------------------------------------
  /** 64-bit SimHash per doc: per-token 64-bit hashes vote ±1 per bit
    * position; the sign vector packs back into one long. Pure aggregation
    * (map-side combinable), no UDF. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitAggs = (0 until 64).map(i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$i"))
    val voted = tok.groupBy(col("id")).agg(bitAggs.head, bitAggs.tail: _*)
    val packed = (0 until 64).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
    }
    voted.select(col("id"), packed.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxDist` Hamming bits. Pigeonhole LSH:
    * split 64 bits into (maxDist+1) chunks — any pair within maxDist must
    * agree on ≥1 chunk, so the join is equi on (chunk, value), then a
    * bit_count refine. Sub-quadratic, shuffle only on chunk buckets. */
  def simhashPairs(sims: DataFrame, maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val banded = sims.select(col("id"), col("simhash"),
      posexplode(array((0 until chunks).map(c =>
        shiftrightunsigned(col("simhash"), c * width)
          .bitwiseAND(lit((1L << width) - 1))): _*)).as(Seq("chunk", "cv")))
    val l = banded.select(col("id").as("id_a"), col("simhash").as("sh_a"),
      col("chunk"), col("cv"))
    val r = banded.select(col("id").as("id_b"), col("simhash").as("sh_b"),
      col("chunk"), col("cv"))
    l.join(r, Seq("chunk", "cv")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  // ---- n-gram Jaccard (set-similarity join) --------------------------------
  /** Inverted-index set-similarity join: explode shingles, drop
    * high-document-frequency shingles (they only generate candidate noise —
    * a standard prefix/frequency filter), count co-occurrences per pair,
    * then exact-Jaccard refine against the full shingle sets. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.6,
                   maxDocFreq: Int = 100): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
    val inv = sh.select(col("id"), explode(col("sh")).as("g"))
    val rare = inv.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDocFreq && col("df") >= 2)
    val filtered = inv.join(rare.select("g"), Seq("g"))
    val cands = filtered.select(col("g"), col("id").as("id_a"))
      .join(filtered.select(col("g"), col("id").as("id_b")), Seq("g"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // ---- embedding-cosine near-dup -------------------------------------------
  /** Near-duplicates by embedding cosine: random-hyperplane LSH buckets
    * (shuffle on the bucket key) + exact cosine refine. See
    * [[graft.sim.Similarity]] for the signature primitives. */
  def embeddingCosine(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double = 0.95, planes: Int = 12,
                      seed: Long = 42L): DataFrame = {
    import graft.sim.Similarity
    val dim = Similarity.dimOf(df, vecCol)
    val hp = Similarity.hyperplanes(planes, dim, seed)
    val sig = df.select(col(idCol).as("id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .withColumn("bucket", Similarity.lshBucket(col("v"), hp))
    val l = sig.select(col("id").as("id_a"), col("v").as("v_a"), col("bucket"))
    val r = sig.select(col("id").as("id_b"), col("v").as("v_b"), col("bucket"))
    l.join(r, Seq("bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cosine"))
      .where(col("cosine") >= threshold)
      .groupBy(col("id_a"), col("id_b")).agg(max(col("cosine")).as("cosine"))
  }

  // ---- connected components (cluster the pair graph) -----------------------
  /** Min-label propagation over a (id_a, id_b) pair graph until fixpoint:
    * each doc converges to the min id of its component ("canonical" doc).
    * Iterations = graph diameter (tiny for dup clusters); each step is one
    * shuffle-join, checkpointed via localCheckpoint to keep lineage flat. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .union(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges.join(labels, edges("b") === labels("id"))
        .groupBy(edges("a").as("id")).agg(min(col("label")).as("nlabel"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
          (coalesce(col("nlabel"), col("label")) < col("label")).as("changed"))
      val anyChanged = updated.where(col("changed")).limit(1).count() > 0
      labels = updated.select("id", "label").localCheckpoint()
      converged = !anyChanged
      iter += 1
    }
    labels
  }
}
