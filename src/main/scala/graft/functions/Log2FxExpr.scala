package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact fixed-point log₂(num/den) with `fracBits` fractional bits, for
  * long inputs num ≥ den > 0 (result ≥ 0).
  *
  * Cross-engine EXACT: floor(log₂) from binary digit counts, ONE
  * correctly-rounded IEEE divide, then `fracBits` repeated-squaring
  * steps — each a multiply, a compare, and a divide-by-two, all
  * correctly-rounded (÷2 is exact) — so every IEEE-754 engine produces
  * identical bits; the DuckDB oracle replays the loop as a recursive CTE
  * and hash-matches. Truncates toward −∞ at 2^-fracBits resolution.
  *
  * A Column-level unrolling of this loop references the running `y` three
  * times per step, so the Catalyst conversion does O(3^fracBits) work —
  * measured as a heap OOM at fracBits=16. This native Expression runs the
  * loop imperatively: O(fracBits) per row, inside whole-stage codegen
  * (the graft (b) extension tier, like [[CosineSimilarity]]).
  */
case class Log2FxExpr(left: Expression, right: Expression, fracBits: Int)
    extends BinaryExpression {
  require(fracBits >= 1 && fracBits <= 30, s"fracBits out of range: $fracBits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_log2fx"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val num = a.asInstanceOf[Long]
    val den = b.asInstanceOf[Long]
    if (den <= 0 || num < den)
      throw new IllegalArgumentException(
        s"graft_log2fx: requires num >= den > 0, got num=$num den=$den")
    Log2FxExpr.log2fx(num, den, fracBits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (num, den) => {
      val e = ctx.freshName("e")
      val y = ctx.freshName("y")
      val y2 = ctx.freshName("y2")
      val bits = ctx.freshName("bits")
      val k = ctx.freshName("k")
      s"""
        if ($den <= 0L || $num < $den)
          throw new IllegalArgumentException(
            "graft_log2fx: requires num >= den > 0, got num=" + $num +
            " den=" + $den);
        int $e = java.lang.Long.numberOfLeadingZeros($den)
               - java.lang.Long.numberOfLeadingZeros($num);
        double $y = (double) $num / (double) ($den << $e);
        if ($y < 1.0d) { $y *= 2.0d; $e -= 1; }
        long $bits = 0L;
        for (int $k = 0; $k < $fracBits; $k++) {
          double $y2 = $y * $y;
          if ($y2 >= 2.0d) { $bits = $bits * 2L + 1L; $y = $y2 / 2.0d; }
          else { $bits = $bits * 2L; $y = $y2; }
        }
        ${ev.value} = ((long) $e << $fracBits) + $bits;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Log2FxExpr =
    copy(left = newLeft, right = newRight)
}

object Log2FxExpr {
  /** Reference JVM implementation (identical to the generated code). */
  def log2fx(num: Long, den: Long, fracBits: Int): Long = {
    var e = java.lang.Long.numberOfLeadingZeros(den) -
      java.lang.Long.numberOfLeadingZeros(num)
    var y = num.toDouble / (den << e).toDouble
    if (y < 1.0d) { y *= 2.0d; e -= 1 }
    var bits = 0L
    var k = 0
    while (k < fracBits) {
      val y2 = y * y
      if (y2 >= 2.0d) { bits = bits * 2 + 1; y = y2 / 2.0d }
      else { bits = bits * 2; y = y2 }
      k += 1
    }
    (e.toLong << fracBits) + bits
  }

  def apply(num: Column, den: Column, fracBits: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(Log2FxExpr(expression(num), expression(den), fracBits))
  }
}
