package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the composed q_training_pipeline flagship
  * (plant → NB gate → DSIR top-K → shuffle → pack); value-level
  * exactness is the DuckDB oracle's job. */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out =
    SparkEntry.queries("q_training_pipeline")(spark, sfDir).cache()

  test("selects at most K docs and drops every planted-spam doc") {
    val rows = out.collect()
    assert(rows.length > 0 && rows.length <= 200)
    // the NB gate catches the planted doc_id % 3 = 0 spam docs (its
    // training accuracy on the planted signal is ~99%; the top-K DSIR
    // cut keeps only positively-classified docs anyway)
    val spamKept = out.where(col("doc_id") % 3 === 0).count()
    assert(spamKept == 0, s"$spamKept spam docs survived the gate")
  }

  test("shuffle positions are a contiguous 0..n-1 permutation") {
    val pos = out.select("shuffle_pos").as[Long].collect().sorted
    assert(pos.toSeq == (0L until pos.length.toLong))
  }

  test("packed offsets are the exclusive prefix sum in shuffle order") {
    val rows = out.select("shuffle_pos", "n_tok", "tok_start")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    rows.foreach { case (_, n, start) =>
      assert(start == acc, s"expected $acc got $start")
      acc += n
    }
  }
}
