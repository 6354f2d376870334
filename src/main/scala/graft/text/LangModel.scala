package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Unigram language-model scoring — the classic perplexity-style quality
  * filter a pretraining pipeline runs over every document: train token
  * counts on the corpus itself (one pass), score each document by its
  * total surprisal under the add-one-smoothed model. High surprisal per
  * token ⇒ gibberish / rare-token soup; low ⇒ boilerplate. (CCNet-style
  * pipelines do exactly this with a 5-gram KenLM; the unigram form is the
  * same plan shape with a trivial model.)
  *
  * Scale shape: explode → groupBy(doc, tok) gets map-side partial
  * aggregation, so the shuffle carries distinct (doc, token) pairs, not
  * tokens; the vocabulary aggregates from that in one more exchange; the
  * score join shuffles on token unless AQE broadcasts the (small) vocab;
  * the final per-doc sum is a partial-agg groupBy. Nothing touches the
  * driver and no stage depends on corpus size beyond the shuffles.
  *
  * Cross-engine determinism: surprisal is −log p, but `ln` is not
  * correctly rounded and Spark/DuckDB may disagree in the last ulp (see
  * [[Relevance]] scaladoc). [[surprisalFx]] therefore computes
  * fixed-point log₂(1/p) EXACTLY: [[ratioLog2Fx]] uses only integer ops,
  * one correctly-rounded division, and a repeated-squaring bit loop of
  * correctly-rounded multiplies — identical bit patterns on every IEEE
  * engine, so the oracle replays it hash-exactly. [[scoreNll]] is the
  * float library variant (natural-log nats) for users; its agreement
  * with the fx scores is spec'd, not oracled.
  */
object LangModel {

  /** Fixed-point log₂(num/den) with `fracBits` fractional bits, for
    * integral columns num ≥ den > 0 (result ≥ 0). EXACT cross-engine —
    * see [[graft.functions.Log2FxExpr]] (a native codegen Expression: a
    * Column-level unrolling of the squaring loop makes the Catalyst
    * conversion exponential in fracBits). */
  def ratioLog2Fx(num: Column, den: Column, fracBits: Int = 16): Column =
    graft.functions.Log2FxExpr(num.cast(LongType), den.cast(LongType), fracBits)

  /** Lowercased whitespace tokens — shares [[Relevance.terms]]. */
  private def toks(text: Column): Column = Relevance.terms(text)

  /** (id, tok, cnt): per-document token frequencies. Widened first so a
    * single-row-group parquet input (one scan task — parquet can't split
    * inside a row group) doesn't serialize the CPU-heavy
    * tokenize+explode stage; no-op on well-partitioned inputs. */
  def docTokenFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.dedup.Dedup.widen(docs)
      .select(col(idCol), explode(toks(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))

  /** (tok, c, surprisal_fx): add-one-smoothed unigram surprisal per
    * vocabulary token, fixed-point log₂ units ([[ratioLog2Fx]], 16
    * fractional bits): surprisal_fx = log2fx((N+V)/(c+1)) where N =
    * corpus tokens, V = vocabulary size. */
  def surprisalFx(dtf: DataFrame): DataFrame = {
    val voc = dtf.groupBy("tok").agg(sum("cnt").as("c"))
    // corpus scalars reduce to ONE row; the cross join broadcasts it
    val tot = voc.agg(sum("c").as("__n"), count(lit(1)).as("__v"))
    voc.crossJoin(tot)
      .withColumn("surprisal_fx",
        ratioLog2Fx(col("__n") + col("__v"), col("c") + 1))
      .drop("__n", "__v")
  }

  /** Per-document total/mean surprisal under the corpus's own smoothed
    * unigram model. Output: (id, n_tok, nll_fx) — nll_fx = Σ_tokens
    * surprisal_fx, an exact integer (order-independent sum, so the
    * oracle matches hash-exactly); mean bits/token = nll_fx / n_tok /
    * 2^16. Zero-token docs emit no row (they have no surprisal). */
  def scoreNllFx(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dtf = docTokenFreqs(docs, idCol, textCol)
    dtf.join(surprisalFx(dtf).select("tok", "surprisal_fx"), "tok")
      .groupBy(col(idCol))
      .agg(sum("cnt").cast(LongType).as("n_tok"),
        sum(col("cnt") * col("surprisal_fx")).cast(LongType).as("nll_fx"))
  }

  /** Pruned-bigram Stupid Backoff scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — one step closer to the
    * CCNet 5-gram filter than [[scoreNllFx]], same fixed-point exactness:
    *
    *  - transition w1→w2 with a retained bigram (corpus count ≥
    *    `minBigramCount`): surprisal = log2fx(c(w1) / c(w1 w2))
    *  - pruned/unseen bigram: Stupid Backoff with α = 0.4 onto the
    *    add-one unigram: surprisal = log2fx(5·(N+V) / (2·(c(w2)+1)))
    *    (folded into ONE log2fx call — exact, no fx addition error)
    *  - a doc's first token has no predecessor: plain unigram surprisal
    *    log2fx((N+V) / (c+1))
    *
    * Self-training means every observed bigram is in the unpruned model,
    * so `minBigramCount` (default 2) is what makes backoff reachable —
    * exactly how a production LM prunes singleton n-grams.
    *
    * Scale shape: three corpus passes over a narrow (id, tokens)
    * projection (unigram counts, bigram counts, per-doc distinct
    * transitions) — each a partial-agg groupBy whose shuffle carries
    * distinct keys, not instances; the model joins are plain equi-joins
    * AQE broadcasts while the model is small and shuffles when it isn't;
    * the per-doc sum is one more partial-agg groupBy. Driver sees
    * nothing. Output: (id, n_tok, nll_fx); zero-token docs emit no row.
    */
  def scoreBigramFx(docs: DataFrame, idCol: String, textCol: String,
                    minBigramCount: Int = 2): DataFrame = {
    require(minBigramCount >= 1,
      s"minBigramCount must be >= 1, got $minBigramCount")
    // widen: same single-row-group rationale as docTokenFreqs
    val tk = graft.dedup.Dedup.widen(docs)
      .select(col(idCol), toks(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
    val uni = tk.select(explode(col("__toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum("c").cast(LongType).as("__n"),
      count(lit(1)).as("__v"))
    // shifted zip_with: the O(tokens) bigram build (same trick as
    // TextOps.repetitionRatio)
    val bigramArr = zip_with(
      slice(col("__toks"), lit(1), size(col("__toks")) - 1),
      slice(col("__toks"), lit(2), size(col("__toks")) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val inst = tk.filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(bigramArr).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val model = inst.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minBigramCount)
    // per-doc DISTINCT transitions with multiplicity: the model joins and
    // log2fx run once per distinct pair, not once per token instance
    val docPairs = inst.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))
    val paired = docPairs
      .join(model, Seq("w1", "w2"), "left")
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(tot)
      .withColumn("surp", when(col("c12").isNotNull,
          ratioLog2Fx(col("c1"), col("c12")))
        .otherwise(ratioLog2Fx(lit(5L) * (col("__n") + col("__v")),
          lit(2L) * (col("c2") + 1))))
      .groupBy(col(idCol))
      .agg(sum(col("m") * col("surp")).cast(LongType).as("__bigram_nll"))
    val first = tk
      .select(col(idCol), size(col("__toks")).cast(LongType).as("n_tok"),
        element_at(col("__toks"), 1).as("tok"))
      .join(uni, "tok").crossJoin(tot)
      .withColumn("__first_surp",
        ratioLog2Fx(col("__n") + col("__v"), col("c") + 1))
      .select(col(idCol), col("n_tok"), col("__first_surp"))
    first.join(paired, Seq(idCol), "left")
      .select(col(idCol), col("n_tok"),
        (col("__first_surp") + coalesce(col("__bigram_nll"), lit(0L)))
          .cast(LongType).as("nll_fx"))
  }

  /** Library variant in natural-log doubles: (id, n_tok, nll_nats,
    * bits_per_token). Same plan shape as [[scoreNllFx]]; float log, so
    * cross-engine hash equality is NOT guaranteed — spec'd against the
    * fx scores within quantization tolerance instead. */
  def scoreNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dtf = docTokenFreqs(docs, idCol, textCol)
    val voc = dtf.groupBy("tok").agg(sum("cnt").as("c"))
    val tot = voc.agg(sum("c").as("__n"), count(lit(1)).as("__v"))
    val sc = voc.crossJoin(tot)
      .withColumn("surprisal",
        -log((col("c") + 1).cast(DoubleType) /
             (col("__n") + col("__v")).cast(DoubleType)))
      .select(col("tok"), col("surprisal"))
    dtf.join(sc, "tok")
      .groupBy(col(idCol))
      .agg(sum("cnt").cast(LongType).as("n_tok"),
        sum(col("cnt") * col("surprisal")).as("nll_nats"))
      .withColumn("bits_per_token",
        col("nll_nats") / col("n_tok") / math.log(2.0))
  }

  /** Curriculum difficulty buckets: rank every document by its mean
    * fixed-point surprisal under the corpus's own unigram model
    * (diff_fx = nll_fx div n_tok — integer division, exact) and cut the
    * GLOBAL order into `buckets` equal-frequency bins
    * (bucket = rank·buckets div n, rank 0-based) — the curriculum-
    * learning prep that orders training data easy → hard. Ties break on
    * the id, so the layout is deterministic and resumable.
    *
    * Scale shape: scoring is [[scoreNllFx]]'s plan; the global rank is
    * the distributed range-partition + driver-offset machinery
    * ([[graft.core.Pipe.zipWithIndex]] — per-partition longs to the
    * driver, rows never leave executors; never a single-partition
    * window); the doc count broadcasts as one row. Output:
    * (id, n_tok, nll_fx, diff_fx, bucket); zero-token docs emit no row. */
  def curriculumBuckets(docs: DataFrame, idCol: String, textCol: String,
                        buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val scored = scoreNllFx(docs, idCol, textCol)
      .withColumn("diff_fx", expr("nll_fx div n_tok"))
    val ranked = graft.core.Pipe(scored)
      .zipWithIndex(Seq(col("diff_fx").asc, col(idCol).asc), "__rank").df
    val n = ranked.agg(count(lit(1)).cast(LongType).as("__n"))
    ranked.crossJoin(n)
      .withColumn("bucket", expr(s"(__rank * ${buckets}L) div __n"))
      .drop("__rank", "__n")
  }
}
