package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.cep.Matcher

/** Event-time windowing + CEP coverage (SURVEY.md §2 rows 41–44) over the
  * `events` table. Window starts are emitted as epoch seconds so the
  * DuckDB comparison is timezone-free.
  */
object EventQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Shared shape of the oracled CEP entries: a 1-hour pattern scan over
    * events, (user_id, start_id, next_id) out. */
  private def cepQuery(pattern: Seq[Matcher.Step],
                       mode: String = "skip_till_next_match")
      : (SparkSession, String) => DataFrame = (s, dir) =>
    Matcher.matchSeq(t(s, dir, "events"),
        "user_id", "ts", "event_type", "event_id", "value",
        pattern, withinMicros = 3600L * 1000000L, mode = mode)
      .select(col("key").as("user_id"),
              element_at(col("ids"), 1).as("start_id"),
              element_at(col("ids"), 2).as("next_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- tumbling window (#43): 1-hour buckets, count+sum per type ----------
    "q_window_tumbling" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
             sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"),
                col("cnt"), col("sum_value"))),
    // -- sliding window (#44): 1 hour every 30 min ---------------------------
    "q_window_sliding" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"),
             sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("ws"), col("cnt"),
                col("sum_value"))),
    // -- session window (#44): 30-min inactivity gap per user ----------------
    "q_window_session" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
                col("cnt"))),
    // -- CEP SEQ (#41): signup → purchase within 1 hour per user -------------
    "q_cep_seq" -> (cepQuery(Seq(
      Matcher.Pos(Matcher.typeIs("signup")),
      Matcher.Pos(Matcher.typeIs("purchase"))))),
    // -- CEP SEQ+NEG (#41): signup → purchase with no intervening error ------
    "q_cep_neg" -> (cepQuery(Seq(
      Matcher.Pos(Matcher.typeIs("signup")),
      Matcher.Neg(Matcher.typeIs("error")),
      Matcher.Pos(Matcher.typeIs("purchase"))))),
    // -- CEP first_match (#41): single-slot automaton — one live partial
    //    per user, new signups ignored while it waits, slot frees on
    //    completion/expiry (reference ceplib engines/FirstMatch.scala) ------
    "q_cep_first" -> (cepQuery(Seq(
      Matcher.Pos(Matcher.typeIs("signup")),
      Matcher.Pos(Matcher.typeIs("purchase"))), mode = "first_match")),
    // -- CEP contiguity_match (#41): strict contiguity — a click matches
    //    only if its IMMEDIATE successor event (any type, (ts,id) order)
    //    is a purchase (reference ceplib engines/ContiguityMatch.scala) --
    "q_cep_contiguity" -> (cepQuery(Seq(
      Matcher.Pos(Matcher.typeIs("click")),
      Matcher.Pos(Matcher.typeIs("purchase"))), mode = "contiguity_match")),
    // -- as-of join: latest purchase at-or-before each click, per user ------
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"), col("value").as("p_value"))
      graft.temporal.TemporalJoins.asofJoin(
          clicks, purchases, Seq("user_id"), "ts", "p_ts",
          Map("p_id" -> "purch_id", "p_value" -> "purch_value"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("purch_id"), col("purch_value"))
    }),
    // -- sessionize: per-EVENT session labels (30-min gap), the event-
    //    granularity complement of q_window_session's aggregation --------
    "q_sessionize" -> ((s, dir) =>
      graft.temporal.TemporalJoins.sessionize(
          t(s, dir, "events"), "user_id", "ts",
          gapMicros = 1800L * 1000000L)
        .select(col("event_id"), col("user_id"), col("session_idx"))),
    // -- interval join: clicks falling in a 30-min window after each signup --
    "q_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("p"))
      val wins = ev.where(col("event_type") === "signup")
        .select(col("event_id").as("win_id"), col("user_id"),
          unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) + 1800000000L).as("hi"))
      graft.temporal.TemporalJoins.intervalJoin(
          clicks, "p", wins, "lo", "hi",
          bucketWidth = 1800000000L, keys = Seq("user_id"))
        .select(col("win_id"), col("click_id"))
    }),
    // -- the same three temporal operators from the dialect (ASOF_JOIN /
    //    SESSIONIZE / INTERVAL_JOIN statements), riding the identical
    //    oracles — drop-in script users reach the temporal family ---------
    "q_pig_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purch_id"), col("user_id"),
          col("ts").as("p_ts"), col("value").as("purch_value"))
      graft.piglatin.PigScript.query(s,
          "x = ASOF_JOIN l BY user_id ON ts, r BY user_id ON p_ts;",
          "x", tables = Map("l" -> clicks, "r" -> purchases))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("purch_id"), col("purch_value"))
    }),
    "q_pig_sessionize" -> ((s, dir) =>
      graft.piglatin.PigScript.query(s,
          "x = SESSIONIZE e BY user_id ON ts GAP 1800000000;",
          "x", tables = Map("e" -> t(s, dir, "events")))
        .select(col("event_id"), col("user_id"), col("session_idx"))),
    "q_pig_interval" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("p"))
      val wins = ev.where(col("event_type") === "signup")
        .select(col("event_id").as("win_id"), col("user_id"),
          unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) + 1800000000L).as("hi"))
      graft.piglatin.PigScript.query(s,
          "x = INTERVAL_JOIN c ON p, w ON lo, hi WIDTH 1800000000 " +
            "BY user_id;",
          "x", tables = Map("c" -> clicks, "w" -> wins))
        .select(col("win_id"), col("click_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_window_tumbling" ->
      """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS ws,
         event_type, COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q_window_sliding" ->
      """WITH e AS (
           SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS ws, value FROM events
           UNION ALL
           SELECT CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT) AS ws, value FROM events)
         SELECT ws, COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM e GROUP BY 1""",
    "q_window_session" ->
      """WITH g AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
                  THEN 1 ELSE 0 END AS new_s
           FROM events),
         s AS (
           SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM g)
         SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
                COUNT(*) AS cnt
         FROM s GROUP BY user_id, sid""",
    "q_cep_seq" ->
      """WITH cand AS (
           SELECT a.user_id, a.event_id AS start_id, b.event_id AS next_id,
             row_number() OVER (PARTITION BY a.event_id
               ORDER BY b.ts, b.event_id) AS rn
           FROM events a JOIN events b
             ON a.user_id = b.user_id AND b.ts > a.ts
            AND epoch(b.ts) - epoch(a.ts) <= 3600
           WHERE a.event_type = 'signup' AND b.event_type = 'purchase')
         SELECT user_id, start_id, next_id FROM cand WHERE rn = 1""",
    "q_cep_neg" ->
      """WITH cand AS (
           SELECT a.user_id, a.event_id AS start_id, b.event_id AS next_id,
             row_number() OVER (PARTITION BY a.event_id
               ORDER BY b.ts, b.event_id) AS rn
           FROM events a JOIN events b
             ON a.user_id = b.user_id AND b.ts > a.ts
            AND epoch(b.ts) - epoch(a.ts) <= 3600
           WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
             AND NOT EXISTS (
               SELECT 1 FROM events n
               WHERE n.user_id = a.user_id AND n.event_type = 'error'
                 AND n.ts > a.ts AND n.ts < b.ts))
         SELECT user_id, start_id, next_id FROM cand WHERE rn = 1""",
    // Independent replay of the first_match single-slot automaton as a
    // lockstep recursive scan. Only signup/purchase events can change the
    // slot state (an other-typed arrival's expiry effect is observable
    // only at the NEXT signup/purchase arrival, where the same expiry
    // test re-fires), so the stream is pre-filtered to those two types.
    // A purchase strictly after the open signup either completes (within
    // 1 h -> emit) or expires the slot — both free it; a signup opens the
    // slot when free or expired, and is ignored while one is live.
    "q_cep_first" ->
      """WITH RECURSIVE ev AS (
           SELECT user_id, CAST(event_id AS BIGINT) AS event_id,
                  epoch_us(ts) AS tsu, event_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
           FROM events WHERE event_type IN ('signup', 'purchase')
         ),
         scan AS (
           SELECT user_id, 0 AS rn,
                  CAST(NULL AS BIGINT) AS open_id,
                  CAST(NULL AS BIGINT) AS open_ts,
                  CAST(NULL AS BIGINT) AS emit_start,
                  CAST(NULL AS BIGINT) AS emit_next
           FROM (SELECT DISTINCT user_id FROM ev)
           UNION ALL
           SELECT e.user_id, e.rn,
             CASE WHEN e.event_type = 'purchase' THEN
                    CASE WHEN s.open_id IS NOT NULL AND e.tsu > s.open_ts
                         THEN NULL ELSE s.open_id END
                  ELSE
                    CASE WHEN s.open_id IS NULL
                           OR e.tsu - s.open_ts > 3600000000
                         THEN e.event_id ELSE s.open_id END
             END AS open_id,
             CASE WHEN e.event_type = 'purchase' THEN
                    CASE WHEN s.open_id IS NOT NULL AND e.tsu > s.open_ts
                         THEN NULL ELSE s.open_ts END
                  ELSE
                    CASE WHEN s.open_id IS NULL
                           OR e.tsu - s.open_ts > 3600000000
                         THEN e.tsu ELSE s.open_ts END
             END AS open_ts,
             CASE WHEN e.event_type = 'purchase' AND s.open_id IS NOT NULL
                    AND e.tsu > s.open_ts
                    AND e.tsu - s.open_ts <= 3600000000
                  THEN s.open_id END AS emit_start,
             CASE WHEN e.event_type = 'purchase' AND s.open_id IS NOT NULL
                    AND e.tsu > s.open_ts
                    AND e.tsu - s.open_ts <= 3600000000
                  THEN e.event_id END AS emit_next
           FROM scan s JOIN ev e
             ON e.user_id = s.user_id AND e.rn = s.rn + 1
         )
         SELECT user_id, emit_start AS start_id, emit_next AS next_id
         FROM scan WHERE emit_start IS NOT NULL""",
    // Contiguity: the deciding event for each open partial is its
    // immediate strict-ts successor (first by event_id at the next
    // distinct timestamp — ties with the start are invisible under the
    // engine's strict-later rule). A click matches iff that successor is
    // a purchase inside the window; ANY other intervening event type
    // kills the partial, which is exactly "rn = 1 over ALL events".
    "q_cep_contiguity" ->
      """WITH succ AS (
           SELECT a.user_id, a.event_id AS start_id,
             b.event_id AS next_id, b.event_type AS b_type,
             epoch_us(b.ts) - epoch_us(a.ts) AS gap_us,
             row_number() OVER (PARTITION BY a.user_id, a.event_id
               ORDER BY b.ts, b.event_id) AS rn
           FROM events a JOIN events b
             ON a.user_id = b.user_id AND b.ts > a.ts
           WHERE a.event_type = 'click')
         SELECT user_id, start_id, next_id FROM succ
         WHERE rn = 1 AND b_type = 'purchase' AND gap_us <= 3600000000""",
    // DuckDB's native ASOF JOIN is the oracle for the engine's
    // union+running-window formulation — two independent algorithms,
    // same contract. (user_id, ts) is unique in this data, so the pick
    // is well-defined on both sides.
    "q_asof_join" -> asofOracleSql,
    "q_pig_asof" -> asofOracleSql,
    "q_sessionize" -> sessionizeOracleSql,
    "q_pig_sessionize" -> sessionizeOracleSql,
    "q_interval_join" -> intervalOracleSql,
    "q_pig_interval" -> intervalOracleSql
  )

  // ---- shared oracle SQL: api + dialect twins ride the SAME replay ---------
  private def asofOracleSql =
    """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
         r.event_id AS purch_id, r.value AS purch_value
       FROM (SELECT * FROM events WHERE event_type = 'click') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
         ON l.user_id = r.user_id AND l.ts >= r.ts"""

  private def sessionizeOracleSql =
    """WITH g AS (
         SELECT event_id, user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       )
       SELECT event_id, user_id,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       FROM g"""

  private def intervalOracleSql =
    """SELECT s.event_id AS win_id, c.event_id AS click_id
       FROM events s JOIN events c
         ON s.user_id = c.user_id
        AND s.event_type = 'signup' AND c.event_type = 'click'
        AND epoch_us(c.ts) >= epoch_us(s.ts)
        AND epoch_us(c.ts) < epoch_us(s.ts) + 1800000000"""
}
