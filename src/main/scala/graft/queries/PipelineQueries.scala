package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.text.TextOps
import graft.dedup.Dedup
import graft.sim.Similarity

/** LLM-training-pipeline coverage (SURVEY.md §2 rows 57–67): dedup,
  * similarity search and text analysis over the `documents` /
  * `embeddings` tables.
  *
  * Near-dup queries plant duplicates deterministically FROM the provided
  * tables (doc text minus its first token / embedding with a perturbed
  * first component, ids offset by 1e6) so the detectors have planted truth
  * to find at every scale factor — the specs assert the planted pairs are
  * recovered, the driver asserts non-emptiness + (where SQL can express
  * the semantics) the DuckDB hash match.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** documents ∪ near-dup copies (first token dropped, id+1_000_000). */
  def plantedDocs(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val dup = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(toks, lit(2), greatest(size(toks) - 1, lit(1)))).as("text"))
    docs.select(col("doc_id"), col("text")).union(dup)
  }

  /** embeddings ∪ perturbed copies (first component +0.001, id+1_000_000). */
  def plantedVecs(emb: DataFrame): DataFrame = {
    val pert = emb.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding").cast(ArrayType(DoubleType)),
        (x, i) => when(i === 0, x + 0.001).otherwise(x)).as("embedding"))
    emb.select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)))
      .union(pert)
  }

  private val enStop = TextOps.enStopwords

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- text analysis (#64–67) ------------------------------------------------
    "q_token_count" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("ws_tokens"),
        TextOps.bpeTokenCount(col("text")).as("bpe_tokens"))),
    "q_quality" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"))),
    "q_lang_id" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.langId(col("text")).as("lang_guess"))),
    "q_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))),

    // -- dedup (#57–61) ---------------------------------------------------------
    "q_dedup_exact" -> ((s, dir) => {
      // exact dedup needs exact copies: plant verbatim duplicates
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.union(
        docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.exact(planted, "doc_id", "text")
    }),
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLsh(plantedDocs(t(s, dir, "documents")),
        "doc_id", "text", numHashes = 32, bands = 8, threshold = 0.5)),
    "q_dedup_simhash" -> ((s, dir) => {
      val sims = Dedup.simhash(plantedDocs(t(s, dir, "documents")),
        "doc_id", "text")
      Dedup.simhashPairs(sims, maxDist = 3)
    }),
    "q_dedup_jaccard" -> ((s, dir) =>
      // 5-gram shingles: near-unique on this corpus (median df = 1), so
      // the inverted index generates candidates ~linearly; 3-grams on a
      // ~30-word vocabulary explode quadratically
      Dedup.ngramJaccard(plantedDocs(t(s, dir, "documents")),
        "doc_id", "text", n = 5, threshold = 0.5, maxDocFreq = 50)),
    "q_dedup_cosine" -> ((s, dir) =>
      Dedup.embeddingCosine(plantedVecs(t(s, dir, "embeddings")),
        "vec_id", "embedding", threshold = 0.999, planes = 10)),

    // -- similarity search (#62–63) ---------------------------------------------
    "q_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("vec"))
      val corpus = emb.where(col("vec_id") >= 5)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.bruteForceTopK(corpus, queries, k = 10)
        .select(col("qid"), col("id"), col("rank"))
    }),
    "q_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("vec"))
      val corpus = emb.where(col("vec_id") >= 5)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.ivfTopK(corpus, queries, k = 10, nCells = 16, nProbe = 6)
        .select(col("qid"), col("id"), col("rank"), round(col("cosine"), 4).as("cosine"))
    }),
    "q_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("vec"))
      val corpus = emb.where(col("vec_id") >= 5)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.lshTopK(corpus, queries, k = 10, bands = 16, bitsPerBand = 4)
        .select(col("qid"), col("id"), col("rank"), round(col("cosine"), 4).as("cosine"))
    })
  )

  private val stopList = enStop.map(w => s"'$w'").mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "q_token_count" ->
      """SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS ws_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
         FROM documents""",
    "q_quality" ->
      s"""WITH q AS (SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks,
           length(text) AS nc,
           length(regexp_replace(text, '[^\\.\\!\\?\\,\\;\\:]', '', 'g')) AS np,
           length(regexp_replace(text, '\\s+', '', 'g')) AS nw
           FROM documents)
         SELECT doc_id,
           (CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains($stopList, lower(x)))) AS DOUBLE) / len(toks) END) * 0.4
           + least((CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(nw AS DOUBLE) / len(toks) END) / 10.0, 1.0) * 0.3
           + (1.0 - (CASE WHEN nc = 0 THEN 0.0 ELSE CAST(np AS DOUBLE) / nc END)) * 0.3 AS quality
         FROM q""",
    "q_fingerprint" ->
      """SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
         FROM documents""",
    "q_dedup_exact" ->
      """WITH planted AS (
           SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id + 1000000, text FROM documents)
         SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
                min(doc_id) AS keep_id, count(*) AS dup_cnt
         FROM planted GROUP BY 1""",
    "q_ann_brute" ->
      """SELECT q.vec_id AS qid, c.vec_id AS id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                             CAST(q.embedding AS DOUBLE[])) DESC,
                      c.vec_id) AS rank
         FROM embeddings q CROSS JOIN embeddings c
         WHERE q.vec_id < 5 AND c.vec_id >= 5
         QUALIFY rank <= 10"""
  )
}
