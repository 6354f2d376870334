package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Benchmark decontamination — the standard pre-training hygiene pass:
  * flag corpus documents that share word n-grams with an evaluation /
  * benchmark set, so eval answers don't leak into training data.
  *
  * Semantics are EXACT n-gram overlap (no probabilistic stage): a document
  * is contaminated iff it shares at least `minHits` distinct word n-grams
  * with the benchmark set, POOLED across benchmark documents (the "total
  * leaked n-grams" policy — a per-single-benchmark-doc threshold would
  * group by (doc, bench) before counting). Tokenization / n-gram
  * formation / the
  * short-doc whole-text collapse are [[Dedup.shingles]] — the same
  * universe the dedup family and its DuckDB oracles already agree on.
  *
  * Scale shape (100 TB corpus, MB-scale benchmark — the realistic ratio):
  * the benchmark side reduces to distinct (bench_id, gram-hash) longs and
  * is broadcast, so the corpus is ONE narrow scan (tokenize → hash n-grams
  * in a native codegen'd Expression) with no corpus-side shuffle for the
  * join; only MATCHED (id, gram, bench_id) rows — a tiny fraction of the
  * corpus — reach the per-doc aggregation exchange, with map-side partial
  * distinct-agg before it. Nothing is all-pairs and the 100-char gram
  * strings never shuffle (8-byte gram-hash keys — the shingle
  * expression's FNV-1a — throughout).
  */
object Decontaminate {

  /** Per-document contamination report: (idCol, matched_ngrams, bench_docs)
    * for every corpus doc sharing ≥ `minHits` distinct n-grams (pooled
    * across the benchmark set — see the object doc) with it.
    * `matched_ngrams` counts distinct overlapping grams, `bench_docs`
    * distinct benchmark docs hit — the two numbers a curation pipeline
    * thresholds on (drop / review buckets).
    */
  def report(corpus: DataFrame, idCol: String, textCol: String,
             bench: DataFrame, benchIdCol: String, benchTextCol: String,
             n: Int = 8, minHits: Long = 1L): DataFrame = {
    val cg = Dedup.hashedShingleDF(corpus.select(col(idCol), col(textCol)),
        idCol, textCol, n)
      .select(col("id").as(idCol), explode(col("sh")).as("g"))
    val bg = Dedup.hashedShingleDF(
        bench.select(col(benchIdCol), col(benchTextCol)),
        benchIdCol, benchTextCol, n)
      .select(col("id").as("__bench_id"), explode(col("sh")).as("g"))
    cg.join(broadcast(bg), "g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("matched_ngrams"),
        countDistinct(col("__bench_id")).as("bench_docs"))
      .where(col("matched_ngrams") >= minHits)
  }

  /** [[report]] behind a BLOOM PREFILTER — output-identical, built for the
    * 100 TB corpus / MB benchmark ratio.
    *
    * [[report]]'s corpus side explodes one row PER TOKEN before the
    * broadcast join probes it. Here the benchmark grams are folded into a
    * bloom filter (`fpp` false-positive rate, no false negatives) and the
    * corpus scan asks ONE question per document — "does any gram hit?" —
    * via the native [[graft.functions.BloomMightContainAny]] expression
    * over the doc's gram array: no corpus-side explode, no join rows, no
    * shuffle. Only candidate docs (true contaminations + `fpp` noise)
    * reach the exact explode→join→count stage, which re-verifies every
    * gram, so the result equals [[report]] exactly. The bloom is also
    * far smaller than the broadcast hash relation (a 10M-gram benchmark
    * is ~12 MB at fpp 1% vs ~160 MB of join hash table), which matters
    * when 1000 executors each hold a copy.
    *
    * The shingle expression evaluates twice for candidate rows (once in
    * the filter, once in the exact stage's explode) — candidates are the
    * contaminated few, so the second pass is noise; the full corpus pays
    * exactly one shingle+bloom pass.
    */
  def reportBloom(corpus: DataFrame, idCol: String, textCol: String,
                  bench: DataFrame, benchIdCol: String, benchTextCol: String,
                  n: Int = 8, minHits: Long = 1L,
                  fpp: Double = 0.01): DataFrame = {
    val bg = graft.core.Intermediates.track(
      Dedup.hashedShingleDF(
          bench.select(col(benchIdCol), col(benchTextCol)),
          benchIdCol, benchTextCol, n)
        .select(col("id").as("__bench_id"), explode(col("sh")).as("g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val bloom = graft.functions.BloomMightContainAny
      .broadcastBloom(bg.select(col("g")), "g", fpp)
    val csh = Dedup.hashedShingleDF(corpus.select(col(idCol), col(textCol)),
      idCol, textCol, n)
    val cg = csh
      .where(graft.functions.BloomMightContainAny(col("sh"), bloom))
      .select(col("id").as(idCol), explode(col("sh")).as("g"))
    cg.join(broadcast(bg), "g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("matched_ngrams"),
        countDistinct(col("__bench_id")).as("bench_docs"))
      .where(col("matched_ngrams") >= minHits)
  }

  /** Bloom-prefiltered [[clean]] — same anti-join posture, candidate
    * flags from [[reportBloom]]. */
  def cleanBloom(corpus: DataFrame, idCol: String, textCol: String,
                 bench: DataFrame, benchIdCol: String, benchTextCol: String,
                 n: Int = 8, minHits: Long = 1L,
                 fpp: Double = 0.01): DataFrame = {
    val flagged = reportBloom(corpus, idCol, textCol,
      bench, benchIdCol, benchTextCol, n, minHits, fpp).select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** FUZZY decontamination — the near-duplicate complement of [[report]]:
    * a corpus doc is contaminated iff its shingle set has Jaccard ≥
    * `threshold` with SOME benchmark doc (the Llama-style fuzzy policy:
    * exact n-gram overlap misses lightly paraphrased / re-tokenized eval
    * leaks; a whole-doc similarity threshold catches them).
    *
    * Same MinHash+LSH machinery as [[Dedup.minhashLsh]], but CROSS-
    * collection: both sides band their signatures, candidates are
    * (corpus, bench) band-bucket collisions, and the exact-Jaccard
    * refine runs on late-fetched shingle sets. Scale shape (100 TB
    * corpus, MB-scale benchmark): the BENCH side's bands and shingle
    * sets are broadcast-small, so the corpus is one narrow scan (shingle
    * → signature → bands, all native expressions) with NO corpus-side
    * shuffle — only band-collision candidates (≈ the contaminated few)
    * ever form rows. Banding math: detection at Jaccard j with r
    * rows/band, b bands is 1-(1-j^r)^b — the q_dedup_minhash defaults
    * (48/16 ⇒ r=3) give ~0.88 at j=0.5 and ~1 above 0.7; raise bands for
    * corpora with organic pairs AT the threshold.
    *
    * @return (idCol, bench_docs, max_jaccard): distinct benchmark docs
    *         matched and the strongest match, per contaminated doc.
    */
  def fuzzyReport(corpus: DataFrame, idCol: String, textCol: String,
                  bench: DataFrame, benchIdCol: String, benchTextCol: String,
                  numHashes: Int = 48, bands: Int = 16,
                  threshold: Double = 0.5, shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val rows = numHashes / bands
    def shingled(df: DataFrame, id: String, text: String, out: String) =
      graft.core.Intermediates.track(
        Dedup.hashedShingleDF(df.select(col(id), col(text)), id, text, shingleN)
          .withColumnRenamed("id", out)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val csh = shingled(corpus, idCol, textCol, "__cid")
    val bsh = shingled(bench, benchIdCol, benchTextCol, "__bid")
    // band tables are METADATA-ONLY (id, band, bandHash) — the shingle
    // arrays stay out of the join (late-fetch rule, as in minhashLsh)
    def banded(sh: DataFrame, id: String) = sh
      .withColumn("__sig", Dedup.minhashSignature(col("sh"), numHashes))
      .select(col(id),
        posexplode(array((0 until bands).map(b =>
          xxhash64(slice(col("__sig"), b * rows + 1, rows))): _*))
          .as(Seq("__band", "__bh")))
    val cands = banded(csh, "__cid")
      .join(broadcast(banded(bsh, "__bid")), Seq("__band", "__bh"))
      .select(col("__cid"), col("__bid")).distinct()
    cands
      .join(csh.select(col("__cid"), col("sh").as("__sh_c")), Seq("__cid"))
      .join(broadcast(bsh.select(col("__bid"), col("sh").as("__sh_b"))),
        Seq("__bid"))
      .select(col("__cid"), col("__bid"),
        Dedup.jaccard(col("__sh_c"), col("__sh_b")).as("__j"))
      .where(col("__j") >= threshold)
      .groupBy(col("__cid").as(idCol))
      .agg(countDistinct(col("__bid")).as("bench_docs"),
        max(col("__j")).as("max_jaccard"))
  }

  /** Fuzzy [[clean]]: the corpus minus near-duplicates of benchmark docs.
    * Same bounded-broadcast caveat as [[clean]] — no hint, AQE decides. */
  def fuzzyClean(corpus: DataFrame, idCol: String, textCol: String,
                 bench: DataFrame, benchIdCol: String, benchTextCol: String,
                 numHashes: Int = 48, bands: Int = 16,
                 threshold: Double = 0.5, shingleN: Int = 3): DataFrame = {
    val flagged = fuzzyReport(corpus, idCol, textCol,
        bench, benchIdCol, benchTextCol, numHashes, bands, threshold, shingleN)
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** The complement pass: the corpus with contaminated docs REMOVED — the
    * actual curation output. One anti-join against the flagged ids.
    *
    * Deliberately NO `broadcast()` hint: `flagged` is normally tiny, but
    * it is "corpus docs sharing ≥1 benchmark n-gram" — on a template-heavy
    * corpus or a large eval union it is O(corpus) in the worst case, and a
    * forced hint overrides Spark's size check (driver OOM at scale, not a
    * slow job). AQE sees the runtime size of the flagged side and picks
    * broadcast itself exactly when it is safe.
    */
  def clean(corpus: DataFrame, idCol: String, textCol: String,
            bench: DataFrame, benchIdCol: String, benchTextCol: String,
            n: Int = 8, minHits: Long = 1L): DataFrame = {
    val flagged = report(corpus, idCol, textCol,
      bench, benchIdCol, benchTextCol, n, minHits).select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
