package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/** Differential testing: streaming windowed aggregations vs plain-Scala
  * models, with the event stream split into RANDOM micro-batch chunks —
  * the cross-batch state machinery (partial windows carried between
  * batches, session merge across a batch boundary) must be invisible in
  * the result. Timestamps are even seconds and the session gap is odd,
  * so no inter-event delta ever sits exactly on the gap and the model
  * cannot diverge on an inclusive/exclusive boundary convention. */
class StreamBatchDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private def chunks[T](xs: Seq[T], rnd: scala.util.Random): Seq[Seq[T]] = {
    // random contiguous chunks (time-ordered stream, arbitrary cut points)
    val cuts = (0 +: (1 until xs.size).filter(_ => rnd.nextBoolean()) :+ xs.size)
    cuts.sliding(2).map { case Seq(a, b) => xs.slice(a, b) }.toSeq
      .filter(_.nonEmpty)
  }

  test("tumbling and sliding windowedAgg equal the model across random " +
      "batch boundaries") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(410 + seed)
      val events = (1 to 60).map { _ =>
        (rnd.nextInt(50).toLong * 2, 1L + rnd.nextInt(3), rnd.nextInt(10).toLong)
      }.sortBy(_._1) // ordered stream, random batch cuts below
      val slide = if (seed % 2 == 0) Some("6 seconds") else None
      val (dur, sl) = (12L, 6L)

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(java.sql.Timestamp, Long, Long)]
      val df = input.toDF().toDF("ts", "uid", "v")
      val agg = Streams.windowedAgg(df, "ts", "12 seconds", slide,
          "0 seconds", Seq("uid"),
          Seq(count(lit(1)).as("cnt"), sum(col("v")).as("s")))
        .select(unix_timestamp(col("window.start")).as("w"),
          col("uid"), col("cnt"), col("s"))
      val sink = s"winbatch_diff_$seed"
      val q = Streams.memorySink(agg, sink, OutputMode.Complete())
      chunks(events, rnd).foreach { c =>
        input.addData(c.map(e => (ts(e._1), e._2, e._3)): _*)
        q.processAllAvailable()
      }
      val got = spark.table(sink)
        .as[(Long, Long, Long, Long)].collect().toSet
      q.stop()

      // plain-Scala model: start-inclusive end-exclusive windows
      def starts(t: Long): Seq[Long] =
        if (slide.isEmpty) Seq(t / dur * dur)
        else {
          // smallest multiple of sl strictly greater than t - dur
          // (floorDiv: plain / truncates toward zero for negatives)
          val first = Math.floorDiv(t - dur, sl) + 1
          (first to Math.floorDiv(t, sl)).map(_ * sl)
        }
      val model = events.flatMap { case (t, uid, v) =>
        starts(t).map(w => (w, uid, v)) }
        .groupBy { case (w, uid, _) => (w, uid) }
        .map { case ((w, uid), g) =>
          (w, uid, g.size.toLong, g.map(_._3).sum) }.toSet
      assert(got == model, s"seed=$seed slide=$slide " +
        s"missing=${(model -- got).take(3)} extra=${(got -- model).take(3)}")
    }
  }

  test("sessionAgg equals the model across random batch boundaries") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(430 + seed)
      val events = (1 to 50).map { _ =>
        (rnd.nextInt(60).toLong * 2, 1L + rnd.nextInt(3))
      }.sortBy(_._1)
      val gap = 7L // odd vs even timestamps: no exactly-at-gap deltas

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(java.sql.Timestamp, Long)]
      val df = input.toDF().toDF("ts", "uid")
      val agg = Streams.sessionAgg(df, "ts", gap = "7 seconds",
          watermarkDelay = "0 seconds", groupCols = Seq("uid"),
          aggs = Seq(count(lit(1)).as("cnt")))
        .select(col("uid"), unix_timestamp(col("session.start")).as("ss"),
          col("cnt"))
      val sink = s"sessbatch_diff_$seed"
      val q = Streams.memorySink(agg, sink, OutputMode.Append())
      chunks(events, rnd).foreach { c =>
        input.addData(c.map(e => (ts(e._1), e._2)): _*)
        q.processAllAvailable()
      }
      // far-future sentinel advances the watermark so every real session
      // closes and emits; excluded from the comparison
      input.addData((ts(10000), 99L))
      input.addData((ts(10100), 99L))
      q.processAllAvailable()
      val got = spark.table(sink).where(col("uid") =!= 99L)
        .as[(Long, Long, Long)].collect().toSet
      q.stop()

      // model: per uid, events sorted (with duplicates), new session when
      // delta > gap; key = (uid, session start, event count)
      val model = events.groupBy(_._2).toSeq.flatMap { case (uid, es) =>
        val sorted = es.map(_._1).sorted
        val sessions = sorted.tail.foldLeft(
          Vector(Vector(sorted.head))) { (acc, t) =>
          if (t - acc.last.last <= gap) acc.init :+ (acc.last :+ t)
          else acc :+ Vector(t)
        }
        sessions.map(s => (uid, s.head, s.size.toLong))
      }.toSet
      assert(got == model, s"seed=$seed " +
        s"missing=${(model -- got).take(3)} extra=${(got -- model).take(3)}")
    }
  }
}
