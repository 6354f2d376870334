package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string — the compression-ratio
  * quality signal (highly templated/repetitive text compresses far
  * below prose; the ratio is a standard cheap pretraining filter
  * alongside the Gopher rules).
  *
  * Native expression rather than a UDF for the usual reasons (no
  * Row boxing, NullIntolerant semantics); the Deflater itself is a
  * JVM-built-in zlib kept in a THREAD-LOCAL and `reset()` per row —
  * allocating a native zlib stream per record would dominate the
  * actual compression at scan throughput. Output counts bytes of the
  * raw-deflate stream (nowrap — no zlib header, so tiny inputs aren't
  * constant-shifted). Deterministic for a fixed JDK zlib; the gate
  * records this operator rows-only and its contracts are spec'd
  * relatively (repetition compresses smaller), not against a
  * cross-engine oracle.
  */
case class DeflateLength(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {
  require(level >= 1 && level <= 9, s"deflate level in [1,9], got $level")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_length"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = DeflateLength.local(level)
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = DeflateLength.scratch.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
}

object DeflateLength {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  // one Deflater per (thread, level): reset() is cheap, native alloc is not
  private val deflaters =
    new ThreadLocal[scala.collection.mutable.Map[Int, java.util.zip.Deflater]] {
      override def initialValue() = scala.collection.mutable.Map.empty
    }
  private def local(level: Int): java.util.zip.Deflater =
    deflaters.get().getOrElseUpdate(level,
      new java.util.zip.Deflater(level, /* nowrap = */ true))
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue() = new Array[Byte](64 * 1024)
  }

  def apply(s: Column, level: Int): Column =
    column(DeflateLength(expression(s), level))
}
