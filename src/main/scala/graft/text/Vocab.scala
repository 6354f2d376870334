package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary extraction — the word-level companion to BPE training
  * (tokenizer prep, OOV audits, frequency-pruned embedding tables).
  * Token counting is the canonical partial-aggregation shape: map-side
  * combine collapses each partition's token stream to its local counts,
  * so the exchange carries (token, count) pairs bounded by vocabulary
  * size per partition — never the token stream. The top-k is
  * TakeOrdered (per-partition heads + driver merge of ≤ k·partitions
  * rows); the rank window runs AFTER the limit, over ≤ k rows. */
object Vocab {

  /** Deterministic token frequency table: whitespace tokens (the shared
    * [[TextOps.tokens]] rule), optional ROOT-locale lowercase, counts ≥
    * `minCount`, top `k` by (count desc, token asc) with an explicit
    * 1-based rank so the order survives any downstream re-sort. */
  def topTokens(df: DataFrame, textCol: Column, minCount: Long = 1L,
                k: Int = 1000, lowercase: Boolean = true): DataFrame = {
    require(minCount >= 1 && k >= 1,
      s"topTokens: minCount and k must be >= 1, got $minCount/$k")
    val toks0 = TextOps.tokens(textCol)
    // case fold inside the array — a generator can't nest under lower()
    val toks = if (lowercase) transform(toks0, t => lower(t)) else toks0
    val counted = df.select(explode(toks).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
    // single-partition window is SAFE: ≤ k rows by construction
    counted.withColumn("rank",
      row_number().over(Window.partitionBy()
        .orderBy(col("cnt").desc, col("token"))).cast("long"))
      .select(col("rank"), col("token"), col("cnt"))
  }

  /** Per-document out-of-vocabulary audit — the tokenizer-fit signal a
    * vocab/corpus pairing is judged by (a rising OOV rate on a new
    * source means the tokenizer was trained on the wrong distribution).
    * For each `idCol` row: `n_tokens`, `n_oov` (tokens not in `vocab`'s
    * `token` column), and `oov_rate` = n_oov/n_tokens (0.0 for empty
    * docs — an empty doc has no OOV problem).
    *
    * Shape: explode → LEFT broadcast join against the vocab (vocabs are
    * k rows by construction — never shuffle the token stream) → one
    * partial-aggregated rollup on the doc id. Tokens are case-folded
    * with the same ROOT-locale rule as [[topTokens]] so the audit and
    * the vocab agree on the token universe. */
  def oovRate(df: DataFrame, idCol: Column, textCol: Column,
              vocab: DataFrame, lowercase: Boolean = true): DataFrame = {
    require(vocab.columns.contains("token"),
      "oovRate: vocab must carry a 'token' column (topTokens output)")
    val toks0 = TextOps.tokens(textCol)
    val toks = if (lowercase) transform(toks0, t => lower(t)) else toks0
    val exploded = df.select(idCol.as("id"), explode(toks).as("token"))
    val flagged = exploded.join(
      broadcast(vocab.select(col("token"), lit(1).as("__in"))),
      Seq("token"), "left")
    val counts = flagged.groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(lit(1)).minus(count(col("__in"))).as("n_oov"))
    // empty/whitespace-only docs produce no exploded rows: re-attach
    // them with zero counts so the audit covers the whole corpus
    df.select(idCol.as("id")).distinct()
      .join(counts, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(col("n_oov").cast("double") /
            col("n_tokens").cast("double")))
  }
}
