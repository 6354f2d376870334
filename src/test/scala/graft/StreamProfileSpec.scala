package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** PROFILE on a streaming relation: the sketch regime's aggregates are
  * all mergeable, so a bounded streamed replay must reproduce the batch
  * sketch EXACTLY (same HLL++/KLL state, same merge algebra — only the
  * merge tree differs, and both are deterministic on identical input). */
class StreamProfileSpec extends SparkSpec {

  test("streamed sketch profile equals the batch sketch, any batch cut") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val staged = java.nio.file.Files
      .createTempDirectory("graft_sprof").toString
    docs.repartition(3).write.mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema
    val cols = Seq("doc_id", "lang", "n_chars")
    val want = graft.core.Profile.sketch(
      spark.read.parquet(staged), cols)
      .collect().map(_.toString).sorted

    for (maxFiles <- Seq(None, Some(1))) {
      val reader = spark.readStream.schema(schema).format("parquet")
      val src = maxFiles.fold(reader)(n =>
        reader.option("maxFilesPerTrigger", n)).load(staged)
      val prof = graft.piglatin.PigScript.query(spark,
        "p = PROFILE s ON doc_id, lang, n_chars USING sketch;",
        "p", tables = Map("s" -> src))
      assert(prof.isStreaming)
      val name = s"sprof_${maxFiles.getOrElse(0)}"
      val q = prof.writeStream.queryName(name)
        .outputMode(OutputMode.Complete()).format("memory")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table(name).collect().map(_.toString).sorted
      assert(got.sameElements(want), s"maxFiles=$maxFiles")
    }
  }

  test("PROFILE ... USING exact on a stream fails loudly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val staged = java.nio.file.Files
      .createTempDirectory("graft_sprof2").toString
    docs.limit(10).write.mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema
    val src = spark.readStream.schema(schema).format("parquet").load(staged)
    val e = intercept[Exception] {
      graft.piglatin.PigScript.query(spark,
        "p = PROFILE s ON doc_id USING exact;",
        "p", tables = Map("s" -> src)).schema
    }
    assert(e.getMessage.contains("sketch only"), e.getMessage)
  }
}
