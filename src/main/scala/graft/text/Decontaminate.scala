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
