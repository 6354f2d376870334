package graft

import org.apache.spark.sql.functions._
import graft.cep.Matcher

/** MATCH_EVENT selection strategies (reference ceplib engines/: FirstMatch
  * vs NextMatch pools; ops/EngineConf.scala:16 rejects the rest).
  */
class CepModeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*) =
    rows.toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("ts", timestamp_micros(col("ts")))
      .withColumn("value", lit(0.0))

  private val seqSP = Seq(Matcher.Pos(Matcher.typeIs("s")),
    Matcher.Pos(Matcher.typeIs("p")))

  private def run(df: org.apache.spark.sql.DataFrame, mode: String) =
    Matcher.matchSeq(df, "user_id", "ts", "event_type", "event_id", "value",
        seqSP, withinMicros = 100L, mode = mode)
      .select(element_at(col("ids"), 1), element_at(col("ids"), 2))
      .as[(Long, Long)].collect().toSet

  test("unsupported modes fail fast instead of silently aliasing") {
    val df = ev((1L, 0L, "s", 1L))
    for (m <- Seq("recent_match", "cognitive_match", "bogus")) {
      val err = intercept[IllegalArgumentException] {
        Matcher.matchSeq(df, "user_id", "ts", "event_type", "event_id",
          "value", seqSP, 100L, mode = m)
      }
      assert(err.getMessage.contains("unsupported MATCH_EVENT mode"))
    }
  }

  test("first_match keeps one live partial; next_match overlaps starts") {
    val df = ev(
      (1L, 0L, "s", 1L), (1L, 10L, "s", 2L),
      (1L, 20L, "p", 3L), (1L, 30L, "p", 4L))
    // next_match: both signups independently complete on the earliest p
    assert(run(df, "skip_till_next_match") == Set((1L, 3L), (2L, 3L)))
    // first_match: signup 2 is ignored while the slot is live; after the
    // (1,3) completion frees the slot, no signup remains to open it
    assert(run(df, "first_match") == Set((1L, 3L)))
  }

  test("first_match slot frees on completion for a later start") {
    val df = ev(
      (3L, 0L, "s", 8L), (3L, 10L, "p", 9L),
      (3L, 20L, "s", 10L), (3L, 30L, "p", 11L))
    assert(run(df, "first_match") == Set((8L, 9L), (10L, 11L)))
  }

  test("first_match WITHIN expiry frees the slot for the arriving signup") {
    val df = ev(
      (2L, 0L, "s", 5L), (2L, 200L, "s", 6L), (2L, 250L, "p", 7L))
    // signup 6 arrives past the 100us window: the stale partial expires
    // first, so 6 opens the slot and completes on 7
    assert(run(df, "first_match") == Set((6L, 7L)))
  }

  test("first_match: a purchase past the window expires without matching") {
    val df = ev(
      (4L, 0L, "s", 12L), (4L, 500L, "p", 13L),
      (4L, 510L, "s", 14L), (4L, 520L, "p", 15L))
    assert(run(df, "first_match") == Set((14L, 15L)))
  }

  test("contiguity_match: any intervening event kills the partial") {
    val df = ev(
      (1L, 0L, "s", 1L), (1L, 10L, "x", 2L), (1L, 20L, "p", 3L),
      (1L, 30L, "s", 4L), (1L, 40L, "p", 5L))
    // start 1 dies on the intervening x; next_match would skip over it
    assert(run(df, "skip_till_next_match") == Set((1L, 3L), (4L, 5L)))
    assert(run(df, "contiguity_match") == Set((4L, 5L)))
  }

  test("contiguity_match: overlapping starts each judged by their successor") {
    val df = ev(
      (2L, 0L, "s", 1L), (2L, 10L, "s", 2L), (2L, 20L, "p", 3L))
    // start 1's successor is signup 2 (kill); start 2's is purchase 3
    assert(run(df, "contiguity_match") == Set((2L, 3L)))
  }

  test("contiguity_match: timestamp ties with the last match are invisible") {
    val df = ev(
      (3L, 0L, "s", 1L), (3L, 0L, "x", 2L), (3L, 10L, "p", 3L))
    // x shares the start's timestamp: not strictly later, cannot kill
    assert(run(df, "contiguity_match") == Set((1L, 3L)))
  }

  test("contiguity_match: WITHIN expiry still applies") {
    val df = ev((4L, 0L, "s", 1L), (4L, 500L, "p", 2L))
    assert(run(df, "contiguity_match") == Set.empty[(Long, Long)])
  }

  test("contiguity_match rejects Neg steps") {
    val df = ev((1L, 0L, "s", 1L))
    val err = intercept[IllegalArgumentException] {
      Matcher.matchSeq(df, "user_id", "ts", "event_type", "event_id",
        "value", Seq(Matcher.Pos(Matcher.typeIs("s")),
          Matcher.Neg(Matcher.typeIs("x")),
          Matcher.Pos(Matcher.typeIs("p"))), 100L,
        mode = "contiguity_match")
    }
    assert(err.getMessage.contains("contiguity_match rejects Neg"))
  }
}
