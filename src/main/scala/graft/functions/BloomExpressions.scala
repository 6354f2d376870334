package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership over a hashed-shingle array, as ONE compiled
  * check per row against a BROADCAST filter.
  *
  * The scale story (what this buys over the exact gram join): testing a
  * 100 TB corpus for overlap with a benchmark set via `explode(grams) ⋈
  * bench_grams` materializes one row PER CORPUS TOKEN before the join
  * probe. This expression answers "does ANY of this doc's grams hit the
  * set?" per document — no explode, no join-side rows, no shuffle; the
  * corpus stays one narrow scan emitting only candidate doc ids. A bloom
  * has NO false negatives, so filtering to candidates and re-running the
  * exact path on them is output-identical to the exact path alone; false
  * positives (rate `fpp`) only cost a few extra docs in the tiny exact
  * stage.
  *
  * The filter travels as a `Broadcast[Array[Byte]]` — the task binary
  * carries the handle, executors fetch the bytes once per JVM (a literal
  * would re-ship MBs with every task). Deserialized lazily per executor.
  */
case class BloomMightContainAny(child: Expression,
                                bloomBytes: Broadcast[Array[Byte]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_any"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes.value))

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    var hit = false
    while (!hit && i < n) {
      hit = bloom.mightContainLong(a.getLong(i))
      i += 1
    }
    hit
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainAny =
    copy(child = newChild)
}

object BloomMightContainAny {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def apply(arr: Column, bloomBytes: Broadcast[Array[Byte]]): Column =
    column(BloomMightContainAny(expression(arr), bloomBytes))

  /** Build a bloom over a LongType column and broadcast its serialized
    * form. `expectedItems` defaults to the row count (an upper bound on
    * distincts — oversizing only wastes bits, undersizing raises the
    * false-positive rate above `fpp`). One action over `df`. */
  def broadcastBloom(df: DataFrame, colName: String,
                     fpp: Double = 0.01,
                     expectedItems: Long = -1L): Broadcast[Array[Byte]] = {
    val n = if (expectedItems > 0) expectedItems else math.max(1L, df.count())
    val bloom = df.stat.bloomFilter(colName, n, fpp)
    val baos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(baos)
    df.sparkSession.sparkContext.broadcast(baos.toByteArray)
  }
}
