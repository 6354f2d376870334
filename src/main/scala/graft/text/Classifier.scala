package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Trained quality classifiers over hashed bag-of-ngrams features — the
  * fastText-style linear filter pretraining pipelines train to separate
  * "looks like the curated reference set" from "looks like raw web
  * text", run IN the engine so the 100 TB corpus never leaves Spark for
  * a sidecar training job.
  *
  * Two trainers, both exactly reproducible across partitionings AND
  * engines (all arithmetic is integer or fixed-point-log₂ integer, and
  * every aggregation is an order-independent sum — so a DuckDB oracle
  * replays a whole training run hash-exactly):
  *
  *  - [[trainNaiveBayes]] — multinomial Naive Bayes: per-class feature
  *    counts → per-bucket log-likelihood-ratio weights + a log-prior
  *    bias. ONE pass over the corpus, no iteration, robust on
  *    overlapping class distributions: the recommended default.
  *  - [[trainPerceptron]] — full-batch perceptron: margins under the
  *    current weights, then Σ y·x over all misclassified docs per
  *    epoch. Converges on direction-separable classes (disjoint
  *    vocabularies); on heavily overlapping distributions the coarse
  *    full-batch step can oscillate rather than settle — classical
  *    per-sample perceptron convergence does not transfer to the batch
  *    variant. Kept because the epoch loop is the template for exact
  *    distributed iterative training (and it is spec'd to converge in
  *    the regime it suits).
  *
  * Features are [[Dsir.docFeatures]] (md5-hashed unigrams + bigrams in
  * `buckets` buckets) plus one reserved BIAS feature (bucket id =
  * `buckets`, count 1, on every doc — without it no threshold concept
  * is expressible and zero-token docs would be unclassifiable).
  *
  * Scale shape: features persist once (distinct (doc, bucket) pairs);
  * weight/count tables are ≤ buckets+1 rows, which AQE broadcasts into
  * every margin join; margins and updates are partial-agg groupBys.
  * Nothing iterates on the driver except the perceptron epoch counter.
  */
object Classifier {

  /** Same contract as [[Dsir]]: the operators SELECT down to (id, …)
    * immediately, so only the id column itself can collide — fail fast. */
  private def reserveId(idCol: String, reserved: Seq[String]): Unit =
    require(!reserved.contains(idCol),
      s"Classifier: id column '$idCol' collides with a reserved output/" +
        s"internal column (${reserved.mkString(", ")}) — rename it first")

  /** (id, bucket, cnt): [[Dsir.docFeatures]] plus the reserved bias
    * feature (bucket = `buckets`, cnt = 1) on EVERY doc — including
    * zero-token docs, which therefore classify by bias alone. */
  def featuresWithBias(docs: DataFrame, idCol: String, textCol: String,
                       buckets: Int): DataFrame =
    addBias(Dsir.docFeatures(docs, idCol, textCol, buckets),
      docs, idCol, buckets)

  /** Append the bias rows to a PRECOMPUTED [[Dsir.docFeatures]] table.
    * `docs` is still needed for the id universe: zero-token docs emit no
    * feature rows, so deriving the bias from `feats` alone would drop
    * them. The reuse seam for composed pipelines — extract the feature
    * pass once, add bias, train and score off the same persisted table. */
  def addBias(feats: DataFrame, docs: DataFrame, idCol: String,
              buckets: Int): DataFrame =
    feats.union(
      docs.select(col(idCol)).distinct()
        .select(col(idCol), lit(buckets.toLong).as("bucket"),
          lit(1L).as("cnt")))

  /** (bucket, w): multinomial Naive Bayes weights in fixed-point log₂
    * units (16 fractional bits). Feature buckets carry the add-one-
    * smoothed class log-likelihood ratio
    * w[b] = [L(cp+1) − L(Np+B)] − [L(cn+1) − L(Nn+B)] (cp/cn the
    * positive/negative class counts, Np/Nn the class totals,
    * B = `buckets`, L(x) = log2fx(x,1) — see [[Dsir.importanceFx]] for
    * why single-count logs can never overflow); the bias bucket carries
    * the class log-prior L(docs⁺+1) − L(docs⁻+1). `label` is any Column
    * evaluating > 0 for positive documents. */
  def trainNaiveBayes(docs: DataFrame, idCol: String, textCol: String,
                      label: Column, buckets: Int = 1024): DataFrame =
    trainNaiveBayesOnFeatures(
      Dsir.docFeatures(docs, idCol, textCol, buckets),
      docs.select(col(idCol),
        when(label > 0, 1L).otherwise(-1L).as("__y")),
      idCol, buckets)

  /** [[trainNaiveBayes]] over a PRECOMPUTED [[Dsir.docFeatures]] table
    * and a `(id, __y ∈ {1,-1})` label table — the reuse seam: composed
    * pipelines extract (and persist) the feature pass once and train /
    * score / DSIR-weight off the same table instead of re-tokenizing the
    * corpus per stage. */
  def trainNaiveBayesOnFeatures(rawFeats: DataFrame, labeled: DataFrame,
                                idCol: String,
                                buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    reserveId(idCol, Seq("bucket", "cnt", "w", "__y", "cp", "cn",
      "__np", "__nn", "__dp", "__dn"))
    // BOTH class counts in ONE aggregation pass (conditional sums),
    // instead of two filtered scans + a full_outer re-join — the feature
    // table and the label join run exactly once. The ≤buckets-row result
    // is persisted (coalesce(1): narrow, single task) because the class
    // totals and the weight assembly each read it.
    val counts = graft.core.Intermediates.track(
      rawFeats.join(labeled, idCol)
        .groupBy("bucket")
        .agg(sum(when(col("__y") === 1L, col("cnt")).otherwise(0L))
            .cast(LongType).as("cp"),
          sum(when(col("__y") === -1L, col("cnt")).otherwise(0L))
            .cast(LongType).as("cn"))
        .coalesce(1)
        .persist(StorageLevel.MEMORY_AND_DISK))
    // BOTH class totals in ONE aggregation of the ≤buckets-row counts
    // table (two separate aggs cost two broadcast-subquery jobs; the
    // serial job chain is this query family's measured floor)
    val totals = counts.agg(
      coalesce(sum("cp"), lit(0L)).cast(LongType).as("__np"),
      coalesce(sum("cn"), lit(0L)).cast(LongType).as("__nn"))
    def L(x: Column) = LangModel.ratioLog2Fx(x, lit(1L))
    val w = counts
      .crossJoin(totals)
      .select(col("bucket"),
        ((L(col("cp") + 1) - L(col("__np") + buckets))
          - (L(col("cn") + 1) - L(col("__nn") + buckets))).as("w"))
    val prior = labeled
      .agg(sum(when(col("__y") === 1L, 1L).otherwise(0L)).cast(LongType)
          .as("__dp"),
        sum(when(col("__y") === -1L, 1L).otherwise(0L)).cast(LongType)
          .as("__dn"))
      .select(lit(buckets.toLong).as("bucket"),
        (L(col("__dp") + 1) - L(col("__dn") + 1)).as("w"))
    w.union(prior)
  }

  /** (bucket, w): integer weight vector after `epochs` full-batch
    * perceptron epochs on [[featuresWithBias]]. Zero-feature docs still
    * carry the bias feature and take part. Epoch update: every doc with
    * y·margin ≤ 0 (ties count as errors, the standard rule) contributes
    * y·x to the weight delta. */
  def trainPerceptron(docs: DataFrame, idCol: String, textCol: String,
                      label: Column, buckets: Int = 1024,
                      epochs: Int = 3): DataFrame =
    trainPerceptronOnFeatures(
      featuresWithBias(docs, idCol, textCol, buckets),
      docs.select(col(idCol),
        when(label > 0, 1L).otherwise(-1L).as("__y")),
      idCol, buckets, epochs)

  /** [[trainPerceptron]] over a PRECOMPUTED [[featuresWithBias]] table
    * and a `(id, __y ∈ {1,-1})` label table (the reuse seam — see
    * [[trainNaiveBayesOnFeatures]]). Both inputs are persisted for the
    * epoch loop (a no-op if the caller already persisted the same
    * DataFrame reference, in which case the epochs AND the caller's
    * later scoring pass share one materialization). */
  def trainPerceptronOnFeatures(featsWithBias: DataFrame,
                                labeled: DataFrame, idCol: String,
                                buckets: Int = 1024,
                                epochs: Int = 3): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    reserveId(idCol, Seq("bucket", "cnt", "w", "__y", "__m", "__dw"))
    val feats = graft.core.Intermediates.track(
      featsWithBias.persist(StorageLevel.MEMORY_AND_DISK))
    val labels = graft.core.Intermediates.track(
      labeled.persist(StorageLevel.MEMORY_AND_DISK))
    // the weight table is ≤ buckets+1 rows; coalesce(1) (narrow, no
    // shuffle) keeps its materializations single-task instead of
    // numShufflePartitions near-empty tasks per epoch
    var w = feats.select("bucket").distinct()
      .withColumn("w", lit(0L)).coalesce(1)
    for (_ <- 1 to epochs) {
      val margins = feats.join(w, "bucket")
        .groupBy(col(idCol))
        .agg(sum(col("cnt") * col("w")).cast(LongType).as("__m"))
      val mis = margins.join(labels, idCol)
        .where(col("__y") * col("__m") <= 0)
        .select(col(idCol), col("__y"))
      val upd = feats.join(mis, idCol)
        .groupBy("bucket")
        .agg(sum(col("__y") * col("cnt")).cast(LongType).as("__dw"))
      // persist each epoch's ≤(buckets+1)-row weight table: without the
      // cut the lineage re-runs every earlier epoch
      w = graft.core.Intermediates.track(
        w.join(upd, Seq("bucket"), "left")
          .select(col("bucket"),
            (col("w") + coalesce(col("__dw"), lit(0L))).as("w"))
          .coalesce(1)
          .persist(StorageLevel.MEMORY_AND_DISK))
    }
    w
  }

  /** (id, margin, pred): margins of `docs` under a trained (bucket, w)
    * table — works for both trainers (the bias bucket is just a feature
    * both sides agree on). Buckets absent from the weight table weigh 0
    * (left join), so out-of-vocabulary docs score rather than
    * disappear; every doc emits a row (bias feature). pred = +1 iff
    * margin > 0. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: DataFrame, buckets: Int = 1024): DataFrame =
    scoreFeatures(featuresWithBias(docs, idCol, textCol, buckets),
      idCol, weights)

  /** [[score]] over a PRECOMPUTED [[featuresWithBias]] table (the reuse
    * seam — see [[trainNaiveBayesOnFeatures]]). */
  def scoreFeatures(featsWithBias: DataFrame, idCol: String,
                    weights: DataFrame): DataFrame = {
    reserveId(idCol, Seq("bucket", "cnt", "w", "margin", "pred"))
    featsWithBias
      .join(weights, Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * coalesce(col("w"), lit(0L)))
        .cast(LongType).as("margin"))
      .withColumn("pred",
        when(col("margin") > 0, 1L).otherwise(-1L))
  }

  /** Classifier calibration at depth — precision/recall of the top-k%
    * prefix under the score order, for k = 1..`steps` percent. This is
    * how corpus-quality thresholds are actually chosen ("keep the top
    * 20% by classifier score"): the curve shows the purity/coverage
    * trade of every cut at once, and the selected depth becomes a
    * [[graft.core.Pipe.topFracByGroup]]-style filter.
    *
    * Exactness contract: ranks come from (score desc, tieKey asc) — the
    * caller passes a totalizing tie key, so the curve is deterministic
    * across engines/retries/partitionings; depth buckets are INTEGER
    * arithmetic (⌈rank·steps/n⌉ = (rank·steps + n − 1) div n), and
    * precision/recall are small-int divisions (bit-equal cross-engine).
    *
    * Scale shape: the global rank rides [[graft.core.Pipe
    * .exclusivePrefixSum]] (range partition + per-partition window +
    * driver offsets — never a single-partition window over the corpus);
    * per-depth partial aggregation reduces to ≤ `steps` rows, and only
    * THOSE go through the bounded cumulative window.
    *
    * @param labelCol 1 for positive rows, anything else negative
    * @return one row per non-empty depth bucket: `pct` (1..steps), `k`
    *         (rows at or above the cut), `tp`, `precision`, `recall` */
  def precisionAtDepth(scored: DataFrame, scoreCol: Column,
                       labelCol: Column, tieKey: Column,
                       steps: Int = 100): DataFrame = {
    require(steps >= 1 && steps <= 10000,
      s"precisionAtDepth: steps must be in [1, 10000], got $steps")
    val clash = scored.columns.toSet.intersect(
      Set("__one", "__rk0", "__y", "pct", "k", "tp", "precision", "recall"))
    require(clash.isEmpty, "precisionAtDepth: input already has " +
      s"reserved column(s) ${clash.mkString(", ")}")
    val d = scored.withColumn("__one", lit(1L))
      .withColumn("__y", when(labelCol === 1, 1L).otherwise(0L))
    val ranked = graft.core.Pipe.exclusivePrefixSum(d,
      Seq(scoreCol.desc, tieKey.asc), "__one", "__rk0").drop("__pid")
    // one bounded action: n and total positives (two longs)
    val totRow = ranked.agg(count(lit(1)), coalesce(sum(col("__y")), lit(0L)))
      .head()
    val (n, pos) = (totRow.getLong(0), totRow.getLong(1))
    require(n > 0, "precisionAtDepth: empty input")
    val perDepth = ranked
      .withColumn("pct", expr(s"CAST(((__rk0 + 1) * $steps + $n - 1) " +
        s"DIV $n AS BIGINT)"))
      .groupBy(col("pct"))
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__tp"))
    // single-partition window is SAFE: ≤ steps rows by construction
    val w = Window.partitionBy().orderBy(col("pct").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDepth
      .withColumn("k", sum(col("__c")).over(w).cast(LongType))
      .withColumn("tp", sum(col("__tp")).over(w).cast(LongType))
      .withColumn("precision",
        col("tp").cast("double") / col("k").cast("double"))
      .withColumn("recall",
        when(lit(pos) === 0L, lit(0.0))
          .otherwise(col("tp").cast("double") / lit(pos.toDouble)))
      .select(col("pct"), col("k"), col("tp"), col("precision"),
        col("recall"))
  }
}
