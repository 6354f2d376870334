package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Learned-BPE encode as a native expression: per word, repeatedly merge
  * the lowest-rank adjacent pair (all occurrences, one left-to-right
  * pass — equivalent to leftmost-single-merge iteration, see
  * [[graft.text.Bpe]]). One interpreted call per ROW; the inner loops
  * are compiled JVM code over arrays. A per-thread word→tokens memo
  * exploits the Zipfian repetition of natural text — each distinct word
  * encodes once per task thread, not once per occurrence. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  // Keyed "a b" with a SPACE separator: symbols can never contain
  // whitespace (words are split on \\s+; the end marker is "</w>"), so
  // the key is provably collision-free -- bare concatenation would let
  // distinct pairs ("ab","c")/("a","bc") alias, and a non-whitespace
  // control char could in principle appear inside a symbol. Matches the
  // oracle's list-keyed merge table.
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + " " + b, i)
    }
    m
  }

  // bounded per-thread memo (distinct words in a shard are far fewer
  // than occurrences; clear-on-full keeps it O(1) memory)
  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, Array[String]]] {
      override def initialValue() =
        new java.util.HashMap[String, Array[String]](1 << 12)
    }

  private def encodeWord(w: String): Array[String] = {
    val cache = memo.get()
    val hit = cache.get(w)
    if (BpeEncode.statsEnabled) {
      (if (hit != null) BpeEncode.memoHits else BpeEncode.memoMisses)
        .incrementAndGet()
    }
    if (hit != null) return hit
    var syms = graft.text.Bpe.splitWord(w)
    var continue = true
    while (continue && syms.length > 1) {
      // lowest-rank pair present
      var bestRank = Int.MaxValue
      var bestL: String = null
      var bestR: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) {
          bestRank = r; bestL = syms(i); bestR = syms(i + 1)
        }
        i += 1
      }
      if (bestL == null) continue = false
      else syms = graft.text.Bpe.mergeAll(syms, (bestL, bestR))
    }
    if (cache.size() > (1 << 16)) cache.clear()
    cache.put(w, syms)
    syms
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString
      .split("\\s+")
    val out = Array.newBuilder[UTF8String]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty)
        encodeWord(words(i)).foreach(t => out += UTF8String.fromString(t))
      i += 1
    }
    new GenericArrayData(out.result().asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** Opt-in memo instrumentation (spec support): the per-thread word memo
  * is the reason encode cost tracks DISTINCT words, not occurrences —
  * the hit-rate spec measures that on real corpus text. One volatile
  * read per word when disabled. */
object BpeEncode {
  @volatile var statsEnabled = false
  val memoHits = new java.util.concurrent.atomic.AtomicLong
  val memoMisses = new java.util.concurrent.atomic.AtomicLong
  def resetStats(): Unit = { memoHits.set(0L); memoMisses.set(0L) }
}

object BpeExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    column(BpeEncode(expression(text), merges))
}
