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
}
