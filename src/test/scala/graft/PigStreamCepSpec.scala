package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.piglatin.PigScript
import graft.streaming.Streams

/** MATCH_EVENT from the Pig dialect on STREAMING relations (reference:
  * ceplib was a scripted streaming feature — `MATCH_EVENT` in streaming
  * scripts over SOCKET_READ sources). When the bound relation is a
  * stream the compiler routes to the stateful streaming scan
  * (`streamMatchSteps`), with `REORDER BY 'delay'` opting into the
  * watermark-delayed reorder buffer for out-of-order sources. */
class PigStreamCepSpec extends SparkSpec {
  import spark.implicits._

  private def script(extra: String = "") =
    s"""m = MATCH_EVENT ev BY uid PATTERN seq(A, B)
       |      WITH (A: kind == 'login', B: kind == 'buy')
       |      WITHIN 30 seconds$extra;""".stripMargin

  test("streaming MATCH_EVENT routes to the stateful scan and matches " +
      "across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val ev = input.toDF().toDF("uid", "ts_s", "kind")
      .select(col("uid"), timestamp_seconds(col("ts_s")).as("ts"), col("kind"))
    val out = PigScript.query(spark, script(), "m", tables = Map("ev" -> ev))
    assert(out.isStreaming, "dialect must produce a STREAMING relation")
    val q = Streams.memorySink(out, "pig_cep_out", OutputMode.Append())
    // batch 1: login opens a partial for uid 7; uid 8's pair is > WITHIN
    input.addData((7L, 100L, "login"), (8L, 10L, "login"))
    q.processAllAvailable()
    assert(spark.table("pig_cep_out").count() == 0)
    // batch 2: uid 7 completes (cross-batch state); uid 8 is outside 30s
    input.addData((7L, 110L, "buy"), (8L, 60L, "buy"))
    q.processAllAvailable()
    val rows = spark.table("pig_cep_out")
      .select("key", "startMicros", "endMicros")
      .as[(Long, Long, Long)].collect().toSet
    q.stop()
    assert(rows == Set((7L, 100000000L, 110000000L)))
  }

  test("REORDER BY buffers out-of-order events until the watermark " +
      "releases them, then matches in event-time order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val ev = input.toDF().toDF("uid", "ts_s", "kind")
      .select(col("uid"), timestamp_seconds(col("ts_s")).as("ts"), col("kind"))
    val out = PigScript.query(spark, script(" REORDER BY '10 seconds'"),
      "m", tables = Map("ev" -> ev))
    val q = Streams.memorySink(out, "pig_cep_reorder_out", OutputMode.Append())
    // arrival order buy-before-login (event times say login first); the
    // 130s row pushes the watermark to 120s so both release next batch
    input.addData((7L, 110L, "buy"), (7L, 100L, "login"), (9L, 130L, "noise"))
    q.processAllAvailable()
    // watermark sentinel: advance past the pair's horizon to flush
    input.addData((9L, 200L, "noise"))
    q.processAllAvailable()
    val rows = spark.table("pig_cep_reorder_out")
      .select("key", "startMicros", "endMicros")
      .as[(Long, Long, Long)].collect().toSet
    q.stop()
    assert(rows == Set((7L, 100000000L, 110000000L)))
  }

  test("REORDER BY on a batch relation is rejected") {
    val ev = Seq((7L, 100L, "login"), (7L, 110L, "buy"))
      .toDF("uid", "ts_s", "kind")
      .select(col("uid"), timestamp_seconds(col("ts_s")).as("ts"), col("kind"))
    val err = intercept[RuntimeException] {
      PigScript.query(spark, script(" REORDER BY '10 seconds'"),
        "m", tables = Map("ev" -> ev)).count()
    }
    assert(err.getMessage.contains("streaming inputs only"))
  }

  test("batch MATCH_EVENT BY key partitions the scan and exposes the key") {
    val ev = Seq(
        (7L, 100L, "login"), (7L, 110L, "buy"),
        (8L, 100L, "login"), (8L, 200L, "buy")) // outside WITHIN
      .toDF("uid", "ts_s", "kind")
      .select(col("uid"), timestamp_seconds(col("ts_s")).as("ts"), col("kind"))
    val out = PigScript.query(spark, script(), "m", tables = Map("ev" -> ev))
    val rows = out.select("key", "startMicros", "endMicros")
      .as[(Long, Long, Long)].collect().toSet
    // without BY these two users would share the global key and 8's
    // login could be completed by 7's buy
    assert(rows == Set((7L, 100000000L, 110000000L)))
  }
}
