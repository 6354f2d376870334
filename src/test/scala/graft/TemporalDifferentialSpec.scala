package graft

import org.apache.spark.sql.functions._
import graft.temporal.TemporalJoins

/** Differential testing: the temporal operators against brute-force
  * in-memory models over seeded random datasets — duplicate timestamps,
  * null keys, degenerate intervals, boundary-sitting points all arise by
  * construction. Seeds are fixed, so failures reproduce. */
class TemporalDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Vector("a", "b", "c", null)

  test("asofJoin (both directions) equals the brute-force model on " +
      "random data") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val left = (1 to 80).map(i =>
        (keys(rnd.nextInt(keys.size)), rnd.nextInt(60).toLong, i.toLong))
      // unique (key, time) on the right — the contract's determinism
      // precondition (ties pick an unspecified row otherwise)
      val right = rnd.shuffle(
        (for (k <- keys; t <- 0 to 60) yield (k, t.toLong)).toVector)
        .take(100).zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i) }
      val lDf = left.toDF("k", "tt", "tid")
      val rDf = right.toDF("k", "qt", "qid")

      def model(back: Boolean): Map[Long, Option[Long]] =
        left.map { case (lk, lt, tid) =>
          val cands = right.filter { case (rk, rt, _) =>
            rk != null && rk == lk && (if (back) rt <= lt else rt >= lt) }
          val pick =
            if (cands.isEmpty) None
            else Some(if (back) cands.maxBy(_._2)._3 else cands.minBy(_._2)._3)
          tid -> pick
        }.toMap

      Seq("backward", "forward").foreach { dir =>
        val got = TemporalJoins.asofJoin(lDf, rDf, Seq("k"), "tt", "qt",
            Map("qid" -> "qid"), dir)
          .select("tid", "qid").as[(Long, Option[Long])].collect().toMap
        assert(got == model(dir == "backward"), s"seed=$seed dir=$dir")
      }
    }
  }

  test("intervalJoin equals the brute-force model on random intervals") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(100 + seed)
      val pts = (1 to 60).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(50).toLong - 10, i.toLong))
      val ivs = (1 to 30).map { i =>
        val lo = rnd.nextInt(50).toLong - 15
        // include degenerate (hi < lo), zero-length and long ranges
        (keys(rnd.nextInt(3)), lo, lo + rnd.nextInt(20) - 3, 100L + i)
      }
      val inclusive = seed % 2 == 0
      val width = 1 + rnd.nextInt(12)

      val expected = (for {
        (pk, p, pid) <- pts
        (ik, lo, hi, rid) <- ivs
        if pk == ik && p >= lo && (if (inclusive) p <= hi else p < hi)
      } yield (pid, rid)).toSet

      val got = TemporalJoins.intervalJoin(
          pts.toDF("k", "p", "pid"), "p",
          ivs.toDF("k", "lo", "hi", "rid"), "lo", "hi",
          bucketWidth = width, keys = Seq("k"), inclusiveHi = inclusive)
        .select("pid", "rid").as[(Long, Long)].collect().toSet
      assert(got == expected,
        s"seed=$seed width=$width inclusive=$inclusive")
    }
  }

  test("sessionize equals the brute-force model on random event times") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(200 + seed)
      val gap = 1L + rnd.nextInt(8)
      val evs = (1 to 100).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(80).toLong * 3 + i % 2, i.toLong))

      val expected = evs.groupBy(_._1).flatMap { case (_, rows) =>
        // model replays the engine's (time ASC) order; duplicate times
        // within a key don't affect the session INDEX (gap 0 never splits)
        val sorted = rows.sortBy(_._2)
        var idx = 0L
        var prev = Long.MinValue
        sorted.map { case (_, t, id) =>
          if (prev == Long.MinValue || t - prev > gap) idx += 1
          prev = t
          id -> idx
        }
      }

      val got = TemporalJoins.sessionize(
          evs.toDF("k", "t", "id"), "k", "t", gapMicros = gap)
        .select("id", "session_idx").as[(Long, Long)].collect().toMap
      assert(got == expected.toMap, s"seed=$seed gap=$gap")
    }
  }
}
