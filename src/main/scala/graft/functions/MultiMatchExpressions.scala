package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton over a fixed literal pattern set — the
  * multi-pattern scan behind blocklist filtering and benchmark-string
  * contamination screening. One pass over the text finds ALL pattern
  * occurrences (including overlapping ones and patterns that are
  * substrings of other patterns), where the naive formulation is one
  * `contains` scan PER pattern — at 100 TB with a thousand-entry
  * blocklist that is the difference between reading the corpus once and
  * reading it a thousand times.
  *
  * Construction is the textbook goto/fail/output BFS (Aho & Corasick
  * 1975, CACM 18(6)); output sets are merged through the fail links
  * during the BFS so a node "knows" every pattern that ends at it,
  * including proper-suffix patterns. Built once per executor via the
  * expression's transient lazy val — the driver serializes only the
  * pattern strings.
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  // goto as per-node char maps: pattern alphabets here are tiny relative
  // to UTF-16, so hash maps beat 64k-wide arrays on memory by orders of
  // magnitude while staying O(1) amortized per char
  private val gotoMaps =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
  private val outIdx = scala.collection.mutable.ArrayBuffer(List.empty[Int])

  for ((p, pi) <- patterns.zipWithIndex) {
    require(p.nonEmpty, "multi-match patterns must be non-empty")
    var st = 0
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      val nxt = gotoMaps(st).get(c)
      st = if (gotoMaps(st).containsKey(c)) nxt
      else {
        gotoMaps += new java.util.HashMap[Char, Int]()
        outIdx += Nil
        gotoMaps(st).put(c, gotoMaps.length - 1)
        gotoMaps.length - 1
      }
      i += 1
    }
    outIdx(st) ::= pi
  }

  private val fail = new Array[Int](gotoMaps.length)
  // out(v) as a flat array of pattern indices (fail-closure merged);
  // outCount(v) cached for the count mode's hot loop
  private val out: Array[Array[Int]] = {
    val res = new Array[Array[Int]](gotoMaps.length)
    val bfs = new java.util.ArrayDeque[Int]()
    res(0) = outIdx(0).toArray
    gotoMaps(0).forEach { (_, v) =>
      fail(v) = 0; bfs.add(v)
    }
    while (!bfs.isEmpty) {
      val u = bfs.poll()
      res(u) = (outIdx(u) ++ res(fail(u)).toList).toArray
      gotoMaps(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).containsKey(c)) f = fail(f)
        fail(v) = if (gotoMaps(f).containsKey(c) && gotoMaps(f).get(c) != v)
          gotoMaps(f).get(c) else 0
        bfs.add(v)
      }
    }
    res
  }
  private val outCount: Array[Int] = out.map(_.length)

  @inline private def step(state: Int, c: Char): Int = {
    var st = state
    while (st != 0 && !gotoMaps(st).containsKey(c)) st = fail(st)
    if (gotoMaps(st).containsKey(c)) gotoMaps(st).get(c) else 0
  }

  /** Which patterns occur in `s` — hit flags indexed by declaration
    * order (caller renders them in that order, matching the DuckDB
    * `list_filter` oracle's list-literal order). */
  def matchFlags(s: String): Array[Boolean] = {
    val hit = new Array[Boolean](patterns.length)
    var st = 0
    var remaining = patterns.length
    var i = 0
    while (i < s.length && remaining > 0) {
      st = step(st, s.charAt(i))
      val os = out(st)
      var j = 0
      while (j < os.length) {
        if (!hit(os(j))) { hit(os(j)) = true; remaining -= 1 }
        j += 1
      }
      i += 1
    }
    hit
  }

  /** Total occurrence count over all patterns — every (end-position,
    * pattern) pair, so overlapping and nested occurrences all count. */
  def countAll(s: String): Long = {
    var st = 0
    var n = 0L
    var i = 0
    while (i < s.length) {
      st = step(st, s.charAt(i))
      n += outCount(st)
      i += 1
    }
    n
  }
}

/** Multi-pattern literal scan as a native expression. `mode` selects the
  * result shape: "matches" → array<string> of the patterns present (in
  * declaration order), "count" → long total occurrence count (all end
  * positions, overlaps included). */
case class MultiMatchExpr(child: Expression, patterns: Seq[String],
                          mode: String)
    extends UnaryExpression with CodegenFallback {
  require(mode == "matches" || mode == "count",
    s"unknown multi-match mode '$mode'")
  override def dataType: DataType =
    if (mode == "matches") ArrayType(StringType, containsNull = false)
    else LongType
  override def prettyName: String = "graft_multi_match"

  @transient private lazy val ac = new AhoCorasick(patterns.toArray)
  @transient private lazy val utf8Patterns =
    patterns.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (mode == "count") ac.countAll(s)
    else {
      val hit = ac.matchFlags(s)
      val buf = new scala.collection.mutable.ArrayBuffer[AnyRef](4)
      var i = 0
      while (i < hit.length) {
        if (hit(i)) buf += utf8Patterns(i)
        i += 1
      }
      new GenericArrayData(buf.toArray)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiMatchExpr = copy(child = newChild)
}
