package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (Gear/FastCDC family: Xia et al., USENIX ATC
  * 2016) — boundaries are a function of the CONTENT, not the offset, so
  * a byte inserted at the head of a document shifts only the chunk it
  * lands in; all later boundaries re-synchronize. That is the property
  * that makes chunk-level dedup work on mutable corpora: fixed-size
  * blocks would see every block change after one insertion.
  *
  * The rolling hash is the gear construction: `h = (h << 1) + g(unit)`,
  * where `g` is a per-unit 64-bit mix. The shift ages a unit out of the
  * hash after 64 steps, giving an implicit 64-unit window with one add
  * and one shift per position — no table of window contents, no modular
  * arithmetic. A boundary is declared when the top `maskBits` bits of
  * `h` are zero (P = 2^-maskBits per position ⇒ expected chunk size
  * minSize + 2^maskBits), subject to hard min/max bounds. The hash
  * resets per chunk (FastCDC's regime), and `g` is derived from
  * splitmix64 — reconstructible anywhere from the algorithm alone, no
  * stored table to version.
  */
object GearHash {
  /** splitmix64 finalizer — the same full-avalanche mix the MinHash
    * permutations use (no F2-linear structure). */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Chunk boundaries over abstract units (chars for strings, bytes for
    * binaries): returns end offsets (exclusive), last == n. */
  def boundaries(n: Int, unitAt: Int => Int, minSize: Int, maskBits: Int,
                 maxSize: Int, noSplitAfter: Int => Boolean): Array[Int] = {
    val mask = ((1L << maskBits) - 1) << (64 - maskBits)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](
      math.max(4, n / (minSize + (1 << maskBits))))
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + mix(unitAt(i).toLong)
      val len = i - start + 1
      val cut = (len >= minSize && (h & mask) == 0L) || len >= maxSize
      // never split between a UTF-16 surrogate pair (string mode): a
      // boundary there would make both neighbor chunks invalid strings
      if (cut && !noSplitAfter(i)) {
        ends += i + 1
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n || n == 0) ends += n
    ends.toArray
  }
}

/** Content-defined chunk split as a native expression: string input →
  * array<string>, binary input → array<binary>. Empty input yields one
  * empty chunk so reassembly is total. */
case class CdcChunksExpr(child: Expression, minSize: Int, maskBits: Int,
                         maxSize: Int)
    extends UnaryExpression with CodegenFallback {
  require(minSize >= 1 && maxSize >= minSize && maskBits >= 1 &&
    maskBits <= 32, s"bad CDC params min=$minSize mask=$maskBits max=$maxSize")

  // def, not val: the ctor runs on unresolved children during analysis
  // rewrites, where dataType would throw
  private def isBinary = child.dataType == BinaryType
  override def dataType: DataType =
    ArrayType(if (isBinary) BinaryType else StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override protected def nullSafeEval(input: Any): Any = {
    if (isBinary) {
      val b = input.asInstanceOf[Array[Byte]]
      val ends = GearHash.boundaries(b.length, i => b(i) & 0xff,
        minSize, maskBits, maxSize, _ => false)
      val out = new Array[AnyRef](ends.length)
      var s = 0
      var k = 0
      while (k < ends.length) {
        out(k) = java.util.Arrays.copyOfRange(b, s, ends(k))
        s = ends(k); k += 1
      }
      new GenericArrayData(out)
    } else {
      val str = input.asInstanceOf[UTF8String].toString
      val ends = GearHash.boundaries(str.length, str.charAt(_).toInt,
        minSize, maskBits, maxSize,
        i => Character.isHighSurrogate(str.charAt(i)))
      val out = new Array[AnyRef](ends.length)
      var s = 0
      var k = 0
      while (k < ends.length) {
        out(k) = UTF8String.fromString(str.substring(s, ends(k)))
        s = ends(k); k += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunksExpr = copy(child = newChild)
}
