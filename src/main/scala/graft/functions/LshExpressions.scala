package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All sign-LSH band buckets of a vector in ONE compiled pass.
  *
  * The Column formulation (`Similarity.lshBucket` folded over
  * `aggregate(zip_with(...))` dots) evaluates bands×bits interpreted
  * higher-order lambdas with per-element boxing for every row — measured
  * as the dominant cost of both `Similarity.lshCandidates` and
  * `Dedup.embeddingCosine`. This expression runs the identical math —
  * bit j of band b is `sign(v · plane_bj) >= 0`, bucket = OR of bits —
  * as a single compiled loop per row (CodegenFallback: one interpreted
  * call per ROW, all arithmetic JIT-compiled).
  *
  * Bit order, plane order, and the sequential accumulation order of each
  * dot product are IDENTICAL to the Column version, so bucket ids (and
  * with them the DuckDB oracle replicas) are unchanged. */
case class HyperplaneBands(child: Expression, planeSets: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_bands"
  override def nullable: Boolean = true

  @transient private lazy val planes: Array[Array[Array[Double]]] =
    planeSets.map(_.map(_.toArray).toArray).toArray

  // emitted only for containsNull schemas (same rule as graft_cosine): a
  // null SLOT read as 0.0 would bucket the vector plausibly-but-wrong
  // and silently lose its true near-neighbours — yield null instead
  @transient private lazy val mayHaveNullSlots: Boolean =
    child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }

  override protected def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    if (mayHaveNullSlots) {
      var i = 0
      val n = ad.numElements()
      while (i < n) {
        if (ad.isNullAt(i)) return null
        i += 1
      }
    }
    val v = ad.toDoubleArray()
    // truncating to min length would bucket a mixed-dimensionality vector
    // "plausibly" and silently lose its true near-neighbours — fail loudly
    // (same contract as graft_cosine)
    if (planes.nonEmpty && planes.head.nonEmpty &&
        v.length != planes.head.head.length)
      throw new IllegalArgumentException(
        s"graft_hyperplane_bands: vector dim ${v.length} != plane dim " +
          s"${planes.head.head.length}")
    val out = new Array[Long](planes.length)
    var b = 0
    while (b < planes.length) {
      val band = planes(b)
      var bucket = 0L
      var j = 0
      while (j < band.length) {
        val p = band(j)
        var d = 0.0
        var i = 0
        val n = math.min(v.length, p.length)
        while (i < n) { d += v(i) * p(i); i += 1 }
        if (d >= 0.0) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object LshExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** array<long> of per-band sign-LSH buckets for an array<double> vector. */
  def hyperplaneBands(v: Column, planeSets: Seq[Seq[Seq[Double]]]): Column =
    column(HyperplaneBands(expression(v), planeSets))
}
