package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ PipelineQueries.queries ++ EventQueries.queries ++ MiscQueries.queries ++ StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ PipelineQueries.oracles ++ EventQueries.oracles ++ MiscQueries.oracles ++ StreamQueries.oracles

  /** Benchmark-only variants (production presets of queries whose
    * `queries` entry deliberately over-provisions for structural oracle
    * equality). Bench times these alongside `queries`; the correctness
    * gate doesn't run them — their accuracy contract is spec'd
    * probabilistically instead (PipelineSpec recall specs). */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.benchOnly

  /** benchOnly variants whose SEMANTICS (not preset) equal an oracled
    * base query: same output schema, deterministic seeds, identical
    * expected rows. Each is pushed through the sf0.1 delta gate against
    * its base oracle once per round so "benchOnly" can never hide a
    * semantic drift (Verify includes them when explicitly named in its
    * filter arg). Excluded with waivers (SURVEY §6): `q_ann_ivfpq`
    * (approximate composition — no exact oracle, PqSpec differential),
    * `q_dedup_semantic_scaled` (1024-cell ids differ from the base's
    * 16-cell output schema by value), `q_bpe_tokens_32k` (different
    * merge budget → different token counts by design). */
  def benchOnlyOracleAlias: Map[String, String] = Map(
    "q_dedup_cosine_prod" -> "q_dedup_cosine",
    "q_dedup_cosine_scaled" -> "q_dedup_cosine",
    "q_ann_ivfpq_res_cached" -> "q_ann_ivfpq_res",
    "q_ann_ivfpq_res_cold" -> "q_ann_ivfpq_res",
    "q_bpe_tokens_cached" -> "q_bpe_tokens",
    "q_bpe_tokens_cold" -> "q_bpe_tokens")
}
