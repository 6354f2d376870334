package graft.matrix

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import breeze.linalg.{DenseMatrix => BDM}

/** Matrix type + operations (reference: Language.md §Matrix,
  * src/main/scala/dbis/piglet/op/... matrix expressions backed by Breeze).
  *
  * graft's matrix column type: struct<rows:int, cols:int,
  * values:array<double>> (row-major). Cheap ops (add, scale, transpose-
  * free per-cell math) are higher-order array functions inside codegen;
  * multiply uses Breeze per row via a typed map — the per-partition
  * imperative escape hatch, matching the reference's Breeze delegation but
  * distributed per-row instead of driver-side.
  */
object MatrixOps {

  val matrixType: StructType = StructType(Seq(
    StructField("rows", IntegerType, nullable = false),
    StructField("cols", IntegerType, nullable = false),
    StructField("values", ArrayType(DoubleType), nullable = false)))

  /** Construct a matrix column from dims + flat row-major values. */
  def matrix(rows: Column, cols: Column, values: Column): Column =
    struct(rows.cast(IntegerType).as("rows"), cols.cast(IntegerType).as("cols"),
      values.cast(ArrayType(DoubleType)).as("values"))

  def fromLiteral(m: BDM[Double]): Column =
    matrix(lit(m.rows), lit(m.cols),
      // lit(Array) not typedLit(Seq): REPL-classloader-safe (no TypeTag)
      lit((0 until m.rows).flatMap(i => (0 until m.cols).map(j => m(i, j))).toArray))

  // ---- codegen-friendly per-cell ops ---------------------------------------
  /** Shape-checked: zip_with pads the shorter array with nulls, so a
    * silent 2x2 + 3x3 would emit a corrupt 9-value "2x2" matrix. */
  def madd(a: Column, b: Column): Column =
    when(a.getField("rows") =!= b.getField("rows") ||
         a.getField("cols") =!= b.getField("cols"),
      raise_error(concat(lit("madd: shape mismatch "),
        a.getField("rows").cast(StringType), lit("x"),
        a.getField("cols").cast(StringType), lit(" vs "),
        b.getField("rows").cast(StringType), lit("x"),
        b.getField("cols").cast(StringType))))
    .otherwise(matrix(a.getField("rows"), a.getField("cols"),
      zip_with(a.getField("values"), b.getField("values"), _ + _)))

  def mscale(a: Column, k: Column): Column =
    matrix(a.getField("rows"), a.getField("cols"),
      transform(a.getField("values"), _ * k))

  def mcell(a: Column, i: Column, j: Column): Column =
    element_at(a.getField("values"), (i * a.getField("cols") + j + 1).cast(IntegerType))

  def msum(a: Column): Column =
    aggregate(a.getField("values"), lit(0.0), _ + _)

  /** Matrix multiply as pure SQL: c[i,j] = Σ_k a[i,k]·b[k,j], unrolled via
    * nested transforms — fine for small (embedding-sized) matrices kept in
    * one cell; for big matrices use block partitioning (see [[blockMultiply]]). */
  def mmul(a: Column, b: Column): Column = {
    val n = a.getField("rows"); val m = a.getField("cols")
    val m2 = b.getField("rows"); val p = b.getField("cols")
    val av = a.getField("values"); val bv = b.getField("values")
    // guards matter: sequence(0, n-1) at n = 0 DESCENDS ([0,-1] — Spark
    // defaults step to -1 when start > stop) and element_at's out-of-
    // range index errors under ANSI; a non-conformable pair would read
    // past bv. CaseWhen branches evaluate lazily, so only the taken arm
    // runs per row.
    val values =
      when(n === 0 || p === 0, array().cast(ArrayType(DoubleType)))
        .when(m === 0, array_repeat(lit(0.0), n * p)) // empty contraction
        .otherwise(flatten(transform(sequence(lit(0), n - 1), i =>
          transform(sequence(lit(0), p - 1), j =>
            aggregate(sequence(lit(0), m - 1), lit(0.0), (acc, k) =>
              acc + element_at(av, (i * m + k + 1).cast(IntegerType)) *
                    element_at(bv, (k * p + j + 1).cast(IntegerType)))))))
    when(m =!= m2,
      raise_error(concat(lit("mmul: dimension mismatch a.cols="),
        m.cast(StringType), lit(" b.rows="), m2.cast(StringType))))
      .otherwise(matrix(n, p, values))
  }

  /** Distributed block matrix multiply over a (blockRow, blockCol, block)
    * relation: the standard SUMMA-style shuffle — replicate A blocks by
    * B's column blocks and join on the contraction index, then reduce.
    * Breeze multiplies the per-pair blocks. */
  def blockMultiply(a: DataFrame, b: DataFrame, blockSize: Int): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val aParts = a.select(col("bi"), col("bj"), col("block")).as[(Int, Int, Seq[Double])]
    val bParts = b.select(col("bi"), col("bj"), col("block")).as[(Int, Int, Seq[Double])]
    val prod = aParts.toDF("abi", "abj", "ablock")
      .join(bParts.toDF("bbi", "bbj", "bblock"), col("abj") === col("bbi"))
      .as[(Int, Int, Seq[Double], Int, Int, Seq[Double])]
      .map { case (abi, _, ab, _, bbj, bb) =>
        // blocks are ROW-major; BDM's array constructor is column-major,
        // so build transposed views and emit the product row-major again
        val am = new BDM(blockSize, blockSize, ab.toArray).t
        val bm = new BDM(blockSize, blockSize, bb.toArray).t
        val prod = am * bm
        val out = Array.tabulate(blockSize * blockSize)(i =>
          prod(i / blockSize, i % blockSize))
        (abi, bbj, out.toSeq)
      }.toDF("bi", "bj", "partial")
    prod.groupBy("bi", "bj")
      .agg(aggregateBlocks(collect_list(col("partial"))).as("block"))
  }

  /** Element-wise sum of a list of equal-length blocks. */
  private def aggregateBlocks(blocks: Column): Column =
    aggregate(blocks, lit(null).cast(ArrayType(DoubleType)),
      (acc, b) => when(acc.isNull, b).otherwise(zip_with(acc, b, _ + _)))
}
