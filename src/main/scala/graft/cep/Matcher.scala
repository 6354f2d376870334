package graft.cep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable.{ArrayBuffer, Queue}

/** Complex-event processing: MATCH_EVENT SEQ/AND/OR/NEG + WITHIN
  * (reference: src/main/scala/dbis/piglet/op/Matcher.scala, Language.md
  * §CEP), re-expressed as a distributed secondary-sort scan.
  *
  * Scale shape: `repartition(key)` + `sortWithinPartitions(key, ts, id)`
  * + one streaming `mapPartitions` pass — the classic secondary-sort
  * pattern. No per-group materialization (a key's events never collect
  * into one array), no driver involvement; open partial matches are
  * bounded by the WITHIN window so state stays O(active window), exactly
  * what a 100 TB event log needs.
  */
object Matcher {

  /** One pattern step over the normalized event view. */
  sealed trait Step extends Serializable
  /** Event must match `pred` (SEQ advance). AND/OR compose inside `pred`:
    * `e => p(e) && q(e)` / `e => p(e) || q(e)`. */
  final case class Pos(pred: Event => Boolean) extends Step
  /** NEG guard between two Pos steps: if a matching event occurs while the
    * partial waits for the NEXT Pos step, the partial dies. */
  final case class Neg(pred: Event => Boolean) extends Step

  final case class Event(key: Long, tsMicros: Long, etype: String,
                         id: Long, value: Double)

  final case class MatchResult(key: Long, ids: Seq[Long],
                               startMicros: Long, endMicros: Long)

  def typeIs(t: String): Event => Boolean = _.etype == t

  /** Modes with an engine behind them. The reference grammar
    * (parser/PigParser.scala:886-910) also accepts `recent_match` /
    * `cognitive_match`, but its engine factory throws "The Strategy is
    * not supported" for both (ceplib ops/EngineConf.scala:16; the
    * RecentMatch enum value has no engine class and CognitiveMatches is
    * not even an enum value) — so graft fails fast at the same point
    * rather than silently aliasing to another mode.
    *
    * `contiguity_match` is the reference's FOURTH real engine (ceplib
    * engines/ContiguityMatch.scala, reachable via
    * SelectionStrategy.ContiguityMatches in EngineConf but never given a
    * grammar keyword) — graft exposes it as a mode string, a documented
    * superset of the reference grammar backed by reference semantics. */
  val supportedModes: Set[String] =
    Set("skip_till_next_match", "skip_till_any_match", "first_match",
      "contiguity_match")

  /** Match a SEQ pattern per key over an event DataFrame.
    *
    * Time column contract: TimestampType converts to epoch micros;
    * NUMERIC columns are read as micros directly (the Pig dialect, whose
    * numeric time unit is seconds, converts before calling — see
    * PigCompiler's MATCH_EVENT). Rows with a null key/time/id/value are
    * dropped (they cannot participate in a keyed time-ordered scan and
    * would crash the primitive encoder).
    *
    * Semantics: skip-till-next-match — every event satisfying step 0 opens
    * a partial match; each partial independently takes the earliest event
    * at a STRICTLY LATER timestamp satisfying its next Pos step (events
    * sharing a timestamp with the previous match are not eligible — the
    * same `b.ts > a.ts` rule as the SQL self-join oracle); events are
    * shared between partials, so two starts can complete on the same
    * closing event; all matched events lie within `withinMicros` of the
    * start.
    *
    * `first_match` (reference ceplib engines/FirstMatch.scala): at most
    * ONE live partial per key — the first event matching step 0 opens it,
    * step-0 events arriving while it is live are ignored, and on
    * completion it is emitted and the slot frees for the NEXT event
    * (the completing event cannot itself re-open, mirroring the
    * reference's entry-time pool-emptiness check). WITHIN expiry and NEG
    * kills free the slot first, so the killing event may open a new
    * partial.
    *
    * `contiguity_match` (reference ceplib engines/ContiguityMatch.scala):
    * STRICT contiguity — every event visible to a partial (strictly later
    * than its last matched timestamp) must advance it, or the partial
    * dies (the reference deletes the structure whenever checkPredicate
    * returns -1). The deciding event for each partial is therefore its
    * immediate successor in (ts, id) order; events tied with the last
    * matched timestamp are invisible, the same strictness rule as the
    * other modes. New partials still open on every step-0 event
    * (reference runEngine calls createNewStructue unconditionally). NEG
    * steps are rejected in this mode: under strict contiguity a
    * negation-window is unexpressible — ANY intervening event kills the
    * partial already, so a Neg step could never fire.
    */
  def matchSeq(events: DataFrame, keyCol: String, tsCol: String,
               typeCol: String, idCol: String, valueCol: String,
               pattern: Seq[Step], withinMicros: Long,
               mode: String = "skip_till_next_match"): DataFrame = {
    require(pattern.nonEmpty && pattern.head.isInstanceOf[Pos],
      "pattern must start with a Pos step")
    // a trailing NEG would need "absence until the WITHIN horizon expires"
    // semantics (delayed emission); the scan completes on the last Pos and
    // would silently IGNORE the negation — reject the shape instead
    require(pattern.last.isInstanceOf[Pos],
      "pattern must end with a Pos step: a trailing Neg (absence after " +
        "the final match) is not supported — bound it with a closing " +
        "Pos step or post-filter the matches")
    require(supportedModes.contains(mode),
      s"unsupported MATCH_EVENT mode '$mode' — supported: " +
        supportedModes.toSeq.sorted.mkString(", ") +
        " (the reference engine also rejects recent_match/cognitive_match)")
    // skip_till_any_match: a partial BRANCHES on every matching event
    // (all combinations emitted) instead of consuming only the earliest
    val anyMatch = mode == "skip_till_any_match"
    val firstMatch = mode == "first_match"
    val contiguity = mode == "contiguity_match"
    require(!contiguity || pattern.forall(_.isInstanceOf[Pos]),
      "contiguity_match rejects Neg steps: strict contiguity already " +
        "kills a partial on ANY non-matching event, so a negation " +
        "window can never fire")
    val spark = events.sparkSession
    import spark.implicits._

    val nPos = pattern.count(_.isInstanceOf[Pos])
    def nextPosIdx(from: Int): Int = {
      var i = from
      while (i < pattern.length && !pattern(i).isInstanceOf[Pos]) i += 1
      i
    }

    // numeric time columns are ALREADY micros (casting a long through
    // TimestampType would read it as seconds — a 1e6 scale error or an
    // ANSI overflow); only real timestamps convert (same dtype branch as
    // TemporalJoins)
    val tsMicros = events.schema(tsCol).dataType match {
      case TimestampType => unix_micros(col(tsCol))
      case _ => col(tsCol).cast(LongType)
    }
    val prepared = events.select(
        col(keyCol).cast(LongType).as("key"),
        tsMicros.as("tsMicros"),
        col(typeCol).cast(StringType).as("etype"),
        col(idCol).cast(LongType).as("id"),
        col(valueCol).cast(DoubleType).as("value"))
      // rows with a null key/time/id cannot participate in a keyed,
      // time-ordered scan, and a null value would crash the primitive
      // Event encoder — drop them instead of dying on one dirty row
      .where(col("key").isNotNull && col("tsMicros").isNotNull &&
        col("id").isNotNull && col("value").isNotNull)
      .as[Event]
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("tsMicros"), col("id"))

    val results = prepared.mapPartitions { it =>
      new Iterator[MatchResult] {
        final class Partial(var next: Int, val ids: ArrayBuffer[Long],
                            val start: Long, var last: Long)
        private var curKey = Long.MinValue
        private val open = ArrayBuffer.empty[Partial]
        private val out = Queue.empty[MatchResult]

        private def feed(e: Event): Unit = {
          if (e.key != curKey) { curKey = e.key; open.clear() }
          // expire partials whose WITHIN window has closed
          open.filterInPlace(p => e.tsMicros - p.start <= withinMicros)
          // NEG guards preceding each partial's next Pos step. Only
          // events STRICTLY AFTER the last matched step can kill — the
          // SQL-oracle form is NOT EXISTS(n.ts > a.ts AND n.ts < b.ts),
          // so a negated event sharing the previous step's timestamp is
          // not "between". (An inverse tie at the COMPLETING step's
          // timestamp is a known corner: the scan cannot see the future.)
          open.filterInPlace { p =>
            var i = p.next - 1
            var alive = true
            while (i >= 0 && pattern(i).isInstanceOf[Neg]) {
              if (e.tsMicros > p.last && pattern(i).asInstanceOf[Neg].pred(e))
                alive = false
              i -= 1
            }
            alive
          }
          // first_match entry check: the slot is "free" only if no partial
          // survived expiry/NEG above — an event completing the live
          // partial below must NOT re-open on itself (reference
          // FirstMatch.runEngine tests pool emptiness before processing)
          val slotFree = open.isEmpty
          // next_match: every open partial advances on its earliest
          // matching event; any_match: it forks instead, staying open
          val forked = ArrayBuffer.empty[Partial]
          open.foreach { p =>
            if (pattern(p.next).asInstanceOf[Pos].pred(e) && e.tsMicros > p.last) {
              if (anyMatch) {
                val ids = p.ids.clone(); ids += e.id
                if (ids.length == nPos)
                  out.enqueue(MatchResult(e.key, ids.toSeq, p.start, e.tsMicros))
                else forked += new Partial(nextPosIdx(p.next + 1), ids,
                  p.start, e.tsMicros)
              } else {
                p.ids += e.id
                p.last = e.tsMicros
                p.next = nextPosIdx(p.next + 1)
                if (p.ids.length == nPos)
                  out.enqueue(MatchResult(e.key, p.ids.toSeq, p.start, e.tsMicros))
              }
            }
          }
          open.filterInPlace(p => p.ids.length < nPos)
          // contiguity: any partial that SAW this event (strictly later
          // than its last match) and did not advance on it is dead — an
          // advanced partial has last == e.tsMicros and survives
          if (contiguity) open.filterInPlace(p => e.tsMicros <= p.last)
          open ++= forked
          // step 0 opens a new partial (overlapping starts allowed;
          // first_match: only into a free slot)
          if ((!firstMatch || slotFree) && pattern.head.asInstanceOf[Pos].pred(e)) {
            if (nPos == 1)
              out.enqueue(MatchResult(e.key, Seq(e.id), e.tsMicros, e.tsMicros))
            else
              open += new Partial(nextPosIdx(1), ArrayBuffer(e.id),
                e.tsMicros, e.tsMicros)
          }
        }

        def hasNext: Boolean = {
          while (out.isEmpty && it.hasNext) feed(it.next())
          out.nonEmpty
        }
        def next(): MatchResult = out.dequeue()
      }
    }
    results.toDF()
  }
}
