package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) code over N quantile-binned numeric columns — the
  * multi-column data-layout key behind [[graft.core.Pipe.storeZOrdered]].
  * Each input is binary-searched against its own quantile boundary array
  * (equi-DEPTH bins — skew-robust where min/max-scaled bins collapse
  * under a heavy hitter), then the bin bits are interleaved round-robin:
  * output bit `b·N + c` is bit `b` of column `c`'s bin. Nearby rows in
  * ANY of the N dimensions land near each other in z-value order, which
  * is what gives every per-column predicate file-level min/max pruning
  * after the layout sort. One compiled pass per row; the boundary arrays
  * are expression literals (driver holds N × (2^bits − 1) doubles).
  * NULL values sort into bin 0 (they cluster together at the low end,
  * like a NULLS FIRST sort). */
case class ZValueExpr(children: Seq[Expression],
                      boundaries: Seq[Array[Double]], bits: Int)
    extends Expression with CodegenFallback {
  require(children.nonEmpty && children.length == boundaries.length,
    "ZValueExpr: one boundary array per input column")
  require(bits >= 1 && bits * children.length <= 63,
    s"ZValueExpr: bits×cols must fit a long, got $bits×${children.length}")
  require(boundaries.forall(_.length == (1 << bits) - 1),
    s"ZValueExpr: need 2^$bits - 1 boundaries per column")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zvalue"

  override def eval(input: InternalRow): Any = {
    val n = children.length
    var out = 0L
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      val bin =
        if (v == null) 0
        else {
          val d = v.asInstanceOf[Double]
          val idx = java.util.Arrays.binarySearch(boundaries(c), d)
          // bin = count of boundaries ≤ d: exact hit at boundary i →
          // i+1, miss → the insertion point (count of boundaries < d);
          // deterministic for duplicate boundary values (same value →
          // same search result on the same array)
          if (idx >= 0) idx + 1 else -(idx + 1)
        }
      var b = 0
      while (b < bits) {
        out |= ((bin >> b) & 1L) << (b * n + c)
        b += 1
      }
      c += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValueExpr =
    copy(children = newChildren)
}

object ZValueExpr {
  def apply(cols: Seq[Column], boundaries: Seq[Array[Double]],
            bits: Int): Column =
    column(new ZValueExpr(cols.map(expression), boundaries, bits))
}
