package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}

import graft.functions.MultiMatchExpr

/** Multi-pattern literal scanning (blocklist screening, benchmark-string
  * contamination checks, policy phrase audits). The naive shape — one
  * `contains()` per pattern OR-folded — re-reads every row once per
  * pattern; [[matchAny]]/[[matchCount]] compile the whole pattern set
  * into one Aho–Corasick automaton and scan each row once regardless of
  * pattern count. Map-only: no shuffle at any corpus size, and the
  * automaton is rebuilt per executor from the serialized pattern list
  * (typically KBs), never shipped as state.
  */
object MultiMatch {

  /** Array of the patterns that occur in `c`, in pattern-declaration
    * order (the same order the DuckDB oracle's list literal preserves
    * through `list_filter`). */
  def matchAny(c: Column, patterns: Seq[String]): Column =
    column(MultiMatchExpr(expression(c), patterns, "matches"))

  /** Total occurrence count across all patterns — every end position
    * counts, so overlapping and nested matches are all included. */
  def matchCount(c: Column, patterns: Seq[String]): Column =
    column(MultiMatchExpr(expression(c), patterns, "count"))

  /** DuckDB oracle twin of [[matchAny]], generated from the SAME pattern
    * constants: `list_filter` keeps list-literal order, matching the
    * engine's declaration-order contract. */
  def matchAnySql(col: String, patterns: Seq[String]): String = {
    val lits = patterns.map(p => "'" + p.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    s"list_filter($lits, p -> contains($col, p))"
  }
}
