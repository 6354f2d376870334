package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The `n` nearest coarse-quantizer cells for a vector by centroid dot
  * product, as ONE compiled loop per row.
  *
  * The Column formulation ([[graft.sim.Similarity.probeCells]]'s
  * original `array(struct(-dot, i)…) → array_sort → slice`) evaluates a
  * separate INTERPRETED `zip_with`/`aggregate` dot per centroid plus an
  * O(k log k) struct sort per row — fine at 16 cells, dominant at the
  * 1024+ cells a scaled SemDeDup/IVF needs (the perf class every native
  * expression in this package exists to avoid). This expression runs
  * k·d fused multiply-adds and one insertion into an n-slot buffer per
  * centroid.
  *
  * EXACT-REPLAY CONTRACT (what the DuckDB oracles rely on): each dot
  * sums left-to-right (identical IEEE order to the HOF form and the
  * SQL `list_reduce` replay), and ties select the LOWEST centroid
  * index — comparisons use `java.lang.Double.compare` on -dot, the
  * same total order (−0.0 < 0.0, NaN greatest) Spark's struct sort
  * applies. Output is identical to the Column formulation on every
  * non-degenerate input (null SLOTS inside a vector read as 0.0 here
  * where the HOF form yields null-poisoned dots; every caller drops
  * null vectors and the test corpora carry containsNull=false).
  */
case class NearestCells(child: Expression, centroids: Seq[Array[Double]],
                        n: Int)
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "NearestCells needs at least one centroid")
  require(n >= 1 && n <= centroids.size,
    s"n must be in [1, ${centroids.size}], got $n")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  @transient private lazy val cents: Array[Array[Double]] = centroids.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    val k = cents.length
    // top-n by ascending (-dot, idx): a sorted insertion buffer — n is
    // tiny (1 for assignment, nProbe for search), so insertion beats a
    // heap and preserves the exact tie order
    val bestNd = new Array[Double](n)
    val bestIx = new Array[Int](n)
    var filled = 0
    var c = 0
    while (c < k) {
      val cent = cents(c)
      require(cent.length == d,
        s"graft_nearest_cells: dimension mismatch ${cent.length} vs $d")
      var s = 0.0
      var i = 0
      while (i < d) { s += v.getDouble(i) * cent(i); i += 1 }
      val nd = -s
      // find insertion point among the filled slots
      var p = filled
      while (p > 0 && java.lang.Double.compare(bestNd(p - 1), nd) > 0) p -= 1
      if (p < n) {
        val last = math.min(filled, n - 1)
        var j = last
        while (j > p) { bestNd(j) = bestNd(j - 1); bestIx(j) = bestIx(j - 1); j -= 1 }
        bestNd(p) = nd; bestIx(p) = c
        if (filled < n) filled += 1
      }
      c += 1
    }
    new GenericArrayData(bestIx.take(filled).asInstanceOf[Array[Int]]
      .map(Int.box).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def apply(v: Column, centroids: Seq[Array[Double]], n: Int): Column =
    column(NearestCells(expression(v), centroids, n))
}
