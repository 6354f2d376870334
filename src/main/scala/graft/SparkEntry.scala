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
}
