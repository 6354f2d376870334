package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-sequence layout operators for LLM data pipelines: GPT-style
  * "concat-and-chunk" sequence packing and RAG-style sliding-window
  * chunking. Neither exists in the reference (it predates LLM curation);
  * both are first-class curation ops per the charter's pipeline layer.
  *
  * Scale shape — [[packConcat]] needs a GLOBAL prefix sum of token
  * counts, the classic single-partition-window trap. It runs on
  * `Pipe.exclusivePrefixSum`, the same distributed engine as RANK:
  * range-partition by the order key, running sum inside each partition,
  * and driver-side cumulative offsets over `numPartitions` longs (the
  * driver never sees rows). [[chunk]] is a narrow per-row pass — split,
  * slice, posexplode — entirely inside whole-stage codegen, with output
  * rows ∝ tokens/stride.
  */
object Pack {

  private def reserve(have: Seq[String], want: Seq[String]): Unit = {
    val clash = have.toSet.intersect(want.toSet)
    require(clash.isEmpty,
      s"Pack: input already has reserved/output column(s) ${clash.mkString(", ")}")
  }

  /** Concat-and-chunk packing: documents are laid end-to-end ordered by
    * `idCol` (must be unique — the layout is deterministic only under a
    * total order) and the token stream is cut every `seqLen` tokens.
    * Emits per doc: `n_tok` (the evaluated `nTok`), `tok_start` (offset
    * of the doc's first token in the global stream), `seq_first` /
    * `seq_last` (ids of the training sequences the doc lands in; a doc
    * with `n_tok` = 0 occupies no tokens and reports the sequence it
    * would start in). `seq_last - seq_first > 0` flags boundary-crossing
    * docs — what a loader masks attention across.
    */
  def packConcat(docs: DataFrame, idCol: String, nTok: Column,
                 seqLen: Long): DataFrame = {
    require(seqLen > 0, s"packConcat: seqLen must be positive, got $seqLen")
    reserve(docs.columns, Seq("n_tok", "tok_start", "seq_first", "seq_last", "__pid"))
    val d = docs.withColumn("n_tok", coalesce(nTok.cast(LongType), lit(0L)))
    graft.core.Pipe.exclusivePrefixSum(d, Seq(col(idCol).asc), "n_tok",
        "tok_start")
      // integer div, not floor(x/y): long/long is a DOUBLE divide in
      // Spark and loses exactness past 2^52 tokens
      .withColumn("seq_first", expr(s"tok_start div ${seqLen}L"))
      .withColumn("seq_last",
        expr(s"(tok_start + greatest(n_tok, 1L) - 1L) div ${seqLen}L"))
      .drop("__pid")
  }

  /** Sliding-window chunking (RAG / context-window prep): tokenize on
    * whitespace, emit one chunk per window of `width` tokens every
    * `stride` tokens, while the window start is inside the doc. The last
    * chunk may be shorter than `width`; zero-token docs emit no chunks.
    * Output: (`idCol`, chunk_idx, chunk_tokens, chunk_text).
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0,
      s"chunk: width/stride must be positive, got width=$width stride=$stride")
    reserve(docs.columns,
      Seq("chunk_idx", "chunk_tokens", "chunk_text", "__toks", "__st"))
    val withToks = docs.withColumn("__toks", TextOps.tokens(col(textCol)))
    val n = size(col("__toks"))
    val starts = when(n > lit(0),
        sequence(lit(0), n - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    withToks
      .select(col(idCol), col("__toks"),
        posexplode(starts).as(Seq("chunk_idx", "__st")))
      .select(col(idCol),
        col("chunk_idx").cast(LongType).as("chunk_idx"),
        least(lit(width), size(col("__toks")) - col("__st"))
          .cast(LongType).as("chunk_tokens"),
        array_join(slice(col("__toks"), col("__st") + 1, lit(width)), " ")
          .as("chunk_text"))
  }
}
