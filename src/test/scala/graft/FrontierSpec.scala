package graft

import org.apache.spark.sql.functions._
import graft.text.Frontier

class FrontierSpec extends SparkSpec {
  import spark.implicits._

  test("slots are per-host in url order; offsets are slot x delay ms; " +
      "missing delay takes the default; null hosts keep null slots") {
    val f = Seq(
      ("a.org", "/u2", Some(2.5)), ("a.org", "/u1", Some(2.5)),
      ("a.org", "/u3", Some(2.5)),
      ("b.org", "/x", None), ("b.org", "/y", None),
      (null.asInstanceOf[String], "/orphan", Some(9.0)))
      .toDF("host", "url", "delay")
    val out = Frontier.schedule(f, col("host"), col("url"), col("delay"))
      .select(col("host"), col("url"), col("fetch_at_ms"))
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(out.contains(("a.org", "/u1", Some(0L))))
    assert(out.contains(("a.org", "/u2", Some(2500L))))
    assert(out.contains(("a.org", "/u3", Some(5000L))))
    assert(out.contains(("b.org", "/x", Some(0L))))      // 1s default
    assert(out.contains(("b.org", "/y", Some(1000L))))
    assert(out.contains((null, "/orphan", None)))        // loud, not dropped
  }

  test("schedule is deterministic under hostile repartitioning and " +
      "rejects reserved columns") {
    val f = (1 to 500).map(i => (s"h${i % 7}", f"/u$i%04d", 0.5))
      .toDF("host", "url", "delay")
    def run(df: org.apache.spark.sql.DataFrame) =
      Frontier.schedule(df, col("host"), col("url"), col("delay"))
        .select("host", "url", "slot", "fetch_at_ms")
        .collect().map(_.toString).sorted.toSeq
    assert(run(f) == run(f.repartition(13, col("url"))))
    val e = intercept[IllegalArgumentException] {
      Frontier.schedule(f.withColumn("slot", lit(1)),
        col("host"), col("url"), col("delay"))
    }
    assert(e.getMessage.contains("reserved"))
    // politeness invariant: within a host, consecutive slots are exactly
    // one delay apart — a fetcher walking slot order can never violate
    // the per-host rate
    val sched = Frontier.schedule(f, col("host"), col("url"), col("delay"))
    val gaps = sched.groupBy(col("host"))
      .agg((max(col("fetch_at_ms")) / greatest(max(col("slot")), lit(1L)))
        .as("g")).collect().map(_.getDouble(1))
    assert(gaps.forall(_ == 500.0), gaps.mkString(","))
  }
}
