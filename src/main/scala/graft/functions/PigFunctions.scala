package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pig built-in functions re-expressed as native (codegen'd) Spark columns.
  *
  * The reference implements these as Scala methods applied per-tuple inside
  * generated RDD code (reference: sparklib/.../PigFuncs.scala,
  * udf/UDF.scala UDFTable). graft maps each onto `functions._` so they stay
  * inside whole-stage codegen — no closure/UDF serialization on the hot path.
  */
object PigFunctions {

  // ---- aggregates (UDFTable: COUNT/AVG/SUM/MIN/MAX/MEDIAN) ----
  def COUNT(c: Column): Column = count(c)
  def SUM(c: Column): Column = sum(c)
  def AVG(c: Column): Column = avg(c)
  def MIN(c: Column): Column = min(c)
  def MAX(c: Column): Column = max(c)
  /** Exact interpolated median via Spark's distributed `percentile`.
    * NOTE: the reference's median (PigFuncs.median) returns the
    * upper-middle ELEMENT (sorted(bag)(n/2)) — for even-sized bags the
    * interpolated value differs; use [[MEDIAN_ELEMENT]] for bug-for-bug
    * reference fidelity. */
  def MEDIAN(c: Column): Column = percentile(c, lit(0.5))

  /** reference-faithful median: the sorted bag's element at index n/2.
    * All-null groups collect an EMPTY bag — guard it, or ANSI mode's
    * element_at(empty, 1) raises INVALID_ARRAY_INDEX instead of the
    * null a median over nothing should yield. */
  def MEDIAN_ELEMENT(c: Column): Column = {
    val sorted = sort_array(collect_list(c))
    when(size(sorted) === 0, lit(null))
      .otherwise(element_at(sorted, (size(sorted) / 2 + 1).cast(IntegerType)))
  }

  // ---- bag functions ----
  def ISEMPTY(bag: Column): Column = size(bag) === 0
  def NONEMPTY(bag: Column): Column = size(bag) > 0
  def BAG_COUNT(bag: Column): Column = size(bag).cast(LongType)
  def BAG_DISTINCT(bag: Column): Column = array_distinct(bag)
  def BAG_SORT(bag: Column): Column = sort_array(bag)

  // ---- string functions (PigFuncs.scala:44-70) ----
  /** TOKENIZE splits on comma/space/quote by default. */
  def TOKENIZE(c: Column, delim: String = """[, "]"""): Column = split(c, delim)
  def STRSPLIT(c: Column, delim: String = ","): Column = split(c, delim)
  def TRIM(c: Column): Column = trim(c)
  /** Pig SUBSTRING(str, start, end) — 0-based, end exclusive (Java semantics). */
  def SUBSTRING(c: Column, start: Int, end: Int): Column =
    substring(c, start + 1, end - start)
  def STRLEN(c: Column): Column = length(c)
  def LOWER(c: Column): Column = lower(c)
  def UPPER(c: Column): Column = upper(c)
  def CONCAT(a: Column, b: Column): Column = concat(a, b)
  def STRCONTAINS(haystack: Column, needle: Column): Column = haystack.contains(needle)
  def STARTSWITH(haystack: Column, prefix: Column): Column = haystack.startsWith(prefix)
  def ENDSWITH(haystack: Column, suffix: Column): Column = haystack.endsWith(suffix)
  def STRISEMPTY(c: Column): Column = length(c) === 0
  def STRNONEMPTY(c: Column): Column = length(c) > 0

  // ---- conversions ----
  def TODOUBLE(c: Column): Column = c.cast(DoubleType)
  def TOINT(c: Column): Column = c.cast(IntegerType)
  def TOMAP(kvs: Column*): Column = map(kvs: _*)

  // ---- math ----
  def SQRT(c: Column): Column = sqrt(c)
  def POW(b: Column, e: Column): Column = pow(b, e)
}
