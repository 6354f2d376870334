package graft

import org.apache.spark.sql.functions._
import graft.temporal.TemporalJoins

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // quotes: (key, time, quote-id); trades: (key, time, trade-id)
  private def quotes = Seq(
    ("a", 10L, 100L), ("a", 20L, 101L), ("a", 30L, 102L),
    ("b", 15L, 200L)).toDF("k", "qt", "qid")
  private def trades = Seq(
    ("a", 5L, 1L),   // before any quote
    ("a", 20L, 2L),  // exactly on a quote
    ("a", 25L, 3L),  // between quotes
    ("b", 99L, 4L),  // long after the only quote
    ("c", 50L, 5L))  // key with no quotes
    .toDF("k", "tt", "tid")

  private def runAsof(direction: String, tol: Option[Long] = None) =
    TemporalJoins.asofJoin(trades, quotes, Seq("k"), "tt", "qt",
        Map("qid" -> "qid"), direction, tol)
      .select("tid", "qid").as[(Long, Option[Long])]
      .collect().toMap

  test("asof backward picks greatest quote time <= trade time, inclusive") {
    assert(runAsof("backward") == Map(
      1L -> None,        // nothing at or before t=5
      2L -> Some(101L),  // equal time included
      3L -> Some(101L),
      4L -> Some(200L),
      5L -> None))       // key never quoted
  }

  test("asof forward picks least quote time >= trade time, inclusive") {
    assert(runAsof("forward") == Map(
      1L -> Some(100L),
      2L -> Some(101L),  // equal time included
      3L -> Some(102L),
      4L -> None,        // nothing after t=99
      5L -> None))
  }

  test("asof tolerance nulls out matches farther than the bound") {
    assert(runAsof("backward", Some(5L)) == Map(
      1L -> None,
      2L -> Some(101L),  // diff 0
      3L -> Some(101L),  // diff 5, inside
      4L -> None,        // diff 84, gated
      5L -> None))
  }

  test("asof plan has exactly one exchange (sort-merge shape, no join)") {
    val plan = TemporalJoins.asofJoin(trades, quotes, Seq("k"), "tt", "qt",
      Map("qid" -> "qid")).queryExecution.executedPlan.toString
    // shuffle nodes print as "Exchange hashpartitioning(...)" (AQE wraps
    // them in ShuffleQueryStage on reuse) — count the real node name
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(!plan.contains("Join"), plan)
    assert(exchanges >= 1 && exchanges <= 2, plan) // both union inputs feed one window shuffle
  }

  private def points = Seq(
    (1L, 0L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 35L), (6L, 100L))
    .toDF("pid", "p")
  // overlapping + degenerate intervals, no key
  private def ranges = Seq(
    (10L, 0L, 20L),    // [0,20): pids 1,2,3
    (11L, 15L, 40L),   // [15,40): pids 3,4,5
    (12L, 50L, 49L))   // degenerate, matches nothing
    .toDF("rid", "lo", "hi")

  test("interval join: overlap, boundary exclusion, degenerate ranges") {
    val got = TemporalJoins.intervalJoin(points, "p", ranges, "lo", "hi",
        bucketWidth = 8)
      .select("rid", "pid").as[(Long, Long)].collect().toSet
    assert(got == Set(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 3L), (11L, 4L), (11L, 5L)))
  }

  test("interval join inclusiveHi includes the upper bound") {
    val got = TemporalJoins.intervalJoin(points, "p", ranges, "lo", "hi",
        bucketWidth = 8, inclusiveHi = true)
      .select("rid", "pid").as[(Long, Long)].collect().toSet
    assert(got.contains((10L, 4L))) // p=20 == hi now included
  }

  test("interval join handles negative domains (floor-div bucketing)") {
    val pts = Seq((1L, -15L), (2L, -8L), (3L, 0L)).toDF("pid", "p")
    val rng = Seq((9L, -16L, -7L)).toDF("rid", "lo", "hi")
    val got = TemporalJoins.intervalJoin(pts, "p", rng, "lo", "hi",
        bucketWidth = 10)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("asof never matches NULL keys to NULL keys (SQL join semantics)") {
    val l = Seq((Option.empty[String], 10L, 1L), (Some("a"), 10L, 2L))
      .toDF("k", "tt", "tid")
    val r = Seq((Option.empty[String], 5L, 100L), (Some("a"), 5L, 200L))
      .toDF("k", "qt", "qid")
    val got = TemporalJoins.asofJoin(l, r, Seq("k"), "tt", "qt",
        Map("qid" -> "qid"))
      .select("tid", "qid").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(200L)))
  }

  test("operators reject inputs that collide with internal column names") {
    val bad = Seq(("a", 1L, 2L)).toDF("k", "t", "__bucket")
    val rng = Seq(("a", 0L, 5L)).toDF("k", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.intervalJoin(bad, "t", rng, "lo", "hi", 10L, Seq("k"))
    }
    assert(e.getMessage.contains("__bucket"))
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(
        Seq(("a", 1L, 2L)).toDF("k", "tt", "__r"),
        Seq(("a", 1L, 2L)).toDF("k", "qt", "qid"),
        Seq("k"), "tt", "qt", Map("qid" -> "qid"))
    }
    assert(e2.getMessage.contains("__r"))
  }

  test("sessionize labels events with 1-based per-key session indexes") {
    // user a: events at 0, 10, 50, 55 with gap 20 → sessions 1,1,2,2
    // user b: single event → session 1; boundary: gap EXACTLY 20 stays
    val ev = Seq(
      ("a", 0L, 1L), ("a", 10L, 2L), ("a", 50L, 3L), ("a", 55L, 4L),
      ("a", 75L, 5L), // 55 → 75 is exactly the gap: same session
      ("b", 99L, 6L)).toDF("k", "t", "id")
    val got = TemporalJoins.sessionize(ev, "k", "t", gapMicros = 20L)
      .select("id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 2L, 6L -> 1L))
  }

  test("sessionize plans one exchange and one sort (windows share them)") {
    val ev = Seq(("a", 0L, 1L)).toDF("k", "t", "id")
    val plan = TemporalJoins.sessionize(ev, "k", "t", 20L)
      .queryExecution.executedPlan.toString
    // the lag and running-sum windows use the same partitioning+ordering,
    // so they stack over ONE exchange and ONE sort (two streaming
    // rows-frame passes; different frames can't fuse into one operator)
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
    assert("Sort ".r.findAllIn(plan).size <= 1, plan)
  }
}
