package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.Streams

/** Streaming heavy hitters vs the batch operator:
  *  - exact regime == HeavyHitters.exact on the same data (any batching);
  *  - Misra–Gries regime: bounds contain the true counts, the surfacing
  *    guarantee holds, and results are IDENTICAL across micro-batch cuts
  *    (merging per batch must not change the sketch vs one batch, given
  *    the same arrival order).
  */
class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish token stream staged as `files` parquet files (the
    * micro-batch cut points under maxFilesPerTrigger=1). */
  private def stage(files: Int): (String, DataFrame) = {
    val toks = (1 to 4000).map { i =>
      val r = ((i * 2654435761L) % 100 + 100) % 100
      val t = if (r < 40) s"hot${r % 4}"
              else if (r < 70) s"warm${r % 13}"
              else s"cold${i % 997}"
      (i, t)
    }
    val df = toks.toDF("seq", "tok")
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_shh_spec").toString
    // contiguous seq ranges per file so arrival order is deterministic
    df.withColumn("f", (col("seq") % files))
      .write.partitionBy("f").mode("overwrite").parquet(dir)
    (dir, df)
  }

  private def runSketch(dir: String, oneBatch: Boolean,
                        capacity: Int): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val reader = spark.readStream.schema(schema).format("parquet")
    val src = (if (oneBatch) reader
               else reader.option("maxFilesPerTrigger", 1)).load(dir)
    val hits = Streams.streamHeavyHittersSketch(src, col("tok"),
      capacity = capacity, numGroups = 8)
    val name = s"shh_${oneBatch}_$capacity"
    val q = hits.toDF().writeStream.queryName(name)
      .outputMode(OutputMode.Update()).format("memory")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    Streams.heavyHittersTopK(spark.table(name), 50)
  }

  test("dialect HEAVY_HITTERS routes streams to the sketch regime too") {
    val (dir, df) = stage(3)
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream.schema(schema).format("parquet").load(dir)
    val hits = graft.piglatin.PigScript.query(spark,
      "h = HEAVY_HITTERS s BY tok TOP 10 USING sketch(capacity=64, groups=4);",
      "h", tables = Map("s" -> src))
    assert(hits.isStreaming)
    val q = hits.writeStream.queryName("shh_dialect")
      .outputMode(OutputMode.Update()).format("memory")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val truth = df.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Streams.heavyHittersTopK(spark.table("shh_dialect"), 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (v, lo, hi) =>
      assert(lo <= truth(v) && truth(v) <= hi) }
  }

  test("exact streaming regime equals the batch operator") {
    val (dir, df) = stage(4)
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream.schema(schema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(dir)
    val top = Streams.streamHeavyHittersExact(src, col("tok"), 10)
    val q = top.writeStream.queryName("shh_exact")
      .outputMode(OutputMode.Complete()).format("memory")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("shh_exact")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = graft.core.HeavyHitters.exact(df, col("tok"), 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want))
  }

  test("MG bounds contain the truth and the frequent values surface") {
    val (dir, df) = stage(4)
    val truth = df.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val capacity = 64
    val got = runSketch(dir, oneBatch = false, capacity)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (v, lo, hi) =>
      assert(lo <= truth(v) && truth(v) <= hi,
        s"$v: [$lo,$hi] !∋ ${truth(v)}")
    }
    // per-group surfacing: anything above n/(capacity+1) must appear
    // (conservative global form — per-group bound is tighter)
    val surfaced = got.map(_._1).toSet
    truth.filter(_._2 > n / (capacity + 1)).keys.foreach { v =>
      assert(surfaced.contains(v), s"frequent '$v' missing from sketch")
    }
  }

  test("MG guarantees hold under BOTH batch cuts (MG itself is arrival-" +
       "order dependent; the bounds and surfacing are not)") {
    val (dir, df) = stage(5)
    val truth = df.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    for (oneBatch <- Seq(true, false)) {
      val got = runSketch(dir, oneBatch, capacity = 32)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      got.foreach { case (v, lo, hi) =>
        assert(lo <= truth(v) && truth(v) <= hi,
          s"oneBatch=$oneBatch $v: [$lo,$hi] !∋ ${truth(v)}")
      }
      val surfaced = got.map(_._1).toSet
      truth.filter(_._2 > n / 33).keys.foreach { v =>
        assert(surfaced.contains(v),
          s"oneBatch=$oneBatch frequent '$v' missing") }
    }
  }
}
