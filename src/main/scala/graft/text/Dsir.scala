package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

/** DSIR-style importance weighting for data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw-corpus document by how much more likely its hashed
  * n-gram features are under a target-domain bag-of-ngrams model than
  * under the raw-corpus model — log λ(doc) = Σ_features log
  * p_target(f)/p_raw(f). Documents that "sound like" the target domain
  * (e.g. a curated reference set) get positive weights; off-domain
  * boilerplate goes negative. Selection is then top-weight or
  * weight-proportional sampling.
  *
  * Features are hashed unigrams + bigrams (the paper's construction) in
  * `buckets` md5-derived buckets, so the model is a fixed-size table
  * regardless of corpus scale. Both unigram and bigram models are
  * add-one smoothed over the bucket space.
  *
  * Scale shape: the per-doc feature pass is explode → groupBy(id,
  * bucket), so the one corpus shuffle carries distinct (doc, bucket)
  * pairs, never raw tokens; both count tables reduce to ≤ `buckets`
  * rows, which AQE broadcasts into the weight join; the final per-doc
  * sum is a partial-agg groupBy. The target side is a curated sample —
  * orders of magnitude smaller than the corpus — and is read once.
  *
  * Cross-engine determinism: weights are SIGNED fixed-point log₂ values
  * built from [[LangModel.ratioLog2Fx]] single-value logs
  * (L(x) = log2fx(x, 1), exact on every IEEE engine — see
  * [[graft.functions.Log2FxExpr]]), combined with integer adds only, so
  * a DuckDB oracle replays doc scores hash-exactly.
  */
object Dsir {

  /** The operators SELECT down to (id, …) immediately, so only the id
    * column itself can collide with an internal/output name — fail fast
    * like the other graft operators instead of silently shadowing. */
  private def reserveId(idCol: String, reserved: Seq[String]): Unit =
    require(!reserved.contains(idCol),
      s"Dsir: id column '$idCol' collides with a reserved output/" +
        s"internal column (${reserved.mkString(", ")}) — rename it first")

  /** md5-derived feature bucket in [0, buckets). Cross-engine: DuckDB
    * replays it as ('0x' || substr(md5(f), 1, 8))::BIGINT % buckets. */
  def bucket(feat: Column, buckets: Int): Column =
    conv(substring(md5(feat.cast(BinaryType)), 1, 8), 16, 10)
      .cast(LongType) % buckets

  /** (id, bucket, cnt): hashed unigram + bigram feature counts per doc.
    * Bigrams join their two tokens on the 0x1F unit separator, so a
    * bigram can never alias a unigram containing a space-free word.
    * Zero-token docs emit no rows. The bigram build is the O(tokens)
    * shifted zip_with (same trick as [[LangModel.scoreBigramFx]]). */
  def docFeatures(docs: DataFrame, idCol: String, textCol: String,
                  buckets: Int): DataFrame = {
    reserveId(idCol, Seq("bucket", "cnt", "f", "__toks"))
    // widen first: tokenize+explode+md5 is the CPU-heavy stage, and a
    // single-row-group parquet file would otherwise run it on ONE task
    // (parquet can't split inside a row group). No-op whenever the scan
    // already carries enough partitions — the normal many-file case.
    val tk = graft.dedup.Dedup.widen(docs)
      .select(col(idCol), Relevance.terms(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
    val unis = tk.select(col(idCol), explode(col("__toks")).as("f"))
    val bigramArr = zip_with(
      slice(col("__toks"), lit(1), size(col("__toks")) - 1),
      slice(col("__toks"), lit(2), size(col("__toks")) - 1),
      (a, b) => concat(a, lit("\u001F"), b))
    val bis = tk.filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(bigramArr).as("f"))
    unis.union(bis)
      .select(col(idCol), bucket(col("f"), buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** (id, n_feat, dsir_fx): per-document signed importance weight in
    * fixed-point log₂ units (16 fractional bits):
    *
    *   dsir_fx = Σ_buckets n_doc[b] · w[b]
    *   w[b]    = [L(ct[b]+1) − L(Nt+B)] − [L(cr[b]+1) − L(Nr+B)]
    *
    * with L(x) = log2fx(x, 1), ct/cr the target/raw bucket counts, Nt/Nr
    * the total feature counts and B = `buckets` (add-one smoothing over
    * the bucket space). Each log is taken of a SINGLE count — never a
    * product — so nothing overflows at any corpus size. n_feat is the
    * doc's total feature count (tokens + bigrams); order by dsir_fx
    * descending (or normalize by n_feat) and keep the top slice, or
    * sample proportionally, to select target-like data.
    */
  def importanceFx(corpus: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, buckets: Int = 1024): DataFrame =
    // corpus features are read twice below (bucket totals + the final
    // per-doc weight join) — persist so the tokenize/explode corpus scan
    // runs once (Intermediates.release() frees it)
    importanceFxOnFeatures(
      graft.core.Intermediates.track(
        docFeatures(corpus, idCol, textCol, buckets)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)),
      docFeatures(target, idCol, textCol, buckets),
      idCol, buckets)

  /** [[importanceFx]] over PRECOMPUTED (id, bucket, cnt) feature tables
    * ([[docFeatures]] output) — the reuse seam for composed pipelines:
    * a chain that trains a classifier, scores, and DSIR-weights the same
    * corpus extracts (and persists) the explode→groupBy feature pass
    * ONCE instead of re-tokenizing per stage. At 100 TB the feature pass
    * is the dominant corpus scan; never run it twice. */
  def importanceFxOnFeatures(feats: DataFrame, targetFeats: DataFrame,
                             idCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    reserveId(idCol,
      Seq("bucket", "cnt", "f", "__toks", "cr", "ct", "w_fx",
        "__nr", "__nt", "n_feat", "dsir_fx"))
    val raw = feats.groupBy("bucket")
      .agg(sum("cnt").cast(LongType).as("cr"))
    val tgt = targetFeats
      .groupBy("bucket").agg(sum("cnt").cast(LongType).as("ct"))
    // totals BEFORE the weight join: target buckets absent from the raw
    // corpus still count toward Nt (only raw buckets need weights, but
    // the smoothed denominator covers the whole target mass)
    val nr = raw.agg(coalesce(sum("cr"), lit(0L)).cast(LongType).as("__nr"))
    val nt = tgt.agg(coalesce(sum("ct"), lit(0L)).cast(LongType).as("__nt"))
    def L(x: Column) = LangModel.ratioLog2Fx(x, lit(1L))
    val w = raw.join(tgt, Seq("bucket"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(nr).crossJoin(nt)
      .select(col("bucket"),
        ((L(col("ct") + 1) - L(col("__nt") + buckets))
          - (L(col("cr") + 1) - L(col("__nr") + buckets))).as("w_fx"))
    feats.join(w, Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum("cnt").cast(LongType).as("n_feat"),
        sum(col("cnt") * col("w_fx")).cast(LongType).as("dsir_fx"))
  }
}
