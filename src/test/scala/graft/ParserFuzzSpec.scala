package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.TimeLimits
import org.scalatest.time.{Seconds, Span}
import graft.piglatin.PigParser

/** Parser robustness fuzzing: random mutations of valid scripts and pure
  * token soup must either parse or throw a controlled error QUICKLY —
  * scala-parser-combinators can backtrack exponentially on pathological
  * input, and a front end that hangs on a typo is a denial of service on
  * the driver. Seeds are fixed; each input gets a hard time limit. */
class ParserFuzzSpec extends AnyFunSuite with TimeLimits {
  implicit val signaler: org.scalatest.concurrent.Signaler =
    org.scalatest.concurrent.ThreadSignaler

  private val base = Seq(
    "a = load 'in.csv' using PigStorage(',') as (x:int, y:chararray);",
    "b = filter a by x > 3 and y matches '.*z';",
    "c = group b by (x, y);",
    "d = foreach c generate group, COUNT(b) as cnt, SUM(b.x);",
    "e = join a by x, b by x;",
    "f = order e by x desc, y;",
    "g = window f rows 10 slide 2;",
    "h = spatial_join a by loc, b by loc using index rtree(order=2);",
    "m = match_event a pattern seq(A, B) with (A: x > 1) mode " +
      "skip_till_next_match within 10 seconds;",
    "store d into 'out' using PigStorage(';');",
    "dump d mute;",
    "split a into p if x > 0, q otherwise;",
    "r = pagerank e by src, dst iter 10;",
    "c2 = connected_components e by id_a, id_b maxiter 12;",
    "w = load 'seg' using WarcStorage();",
    "h2 = heavy_hitters a by y top 5 using sketch(capacity=64);",
    "p2 = profile a on x, y using sketch(rsd=0.05);",
    "t1 = asof_join a by k on ts, b by k on rts tolerance 1000 " +
      "direction forward;",
    "t2 = interval_join p on pt, i on lo, hi width 3600 by k inclusive;",
    "t3 = sessionize a by user on ts gap 1800000000;",
    "t4 = quota_sample a by lang top 50 key id;",
    "t5 = mixture a by lang target 'en' 0.5, 'de' 0.5 key id;",
    "t6 = overlap a, b by k using sketch;",
    "store a into 'dir' using SortedStorage('x', 'id', '64');",
    "store a into 'dir' using ZOrderStorage('x', 'y');",
    "store a into 'dir' using ManifestStorage('id');")

  private def tryParse(s: String): Unit =
    try PigParser.parseScript(s)
    catch { case _: Throwable => () } // any THROWN error is acceptable

  test("random mutations of valid scripts parse or fail fast") {
    val rnd = new scala.util.Random(4242)
    for (round <- 1 to 300) {
      val script = (1 to (1 + rnd.nextInt(4)))
        .map(_ => base(rnd.nextInt(base.size))).mkString("\n")
      val mutated = rnd.nextInt(4) match {
        case 0 => script.take(rnd.nextInt(script.length + 1)) // truncate
        case 1 => // delete a random span
          val i = rnd.nextInt(script.length)
          script.take(i) + script.drop(math.min(script.length, i + 1 + rnd.nextInt(12)))
        case 2 => // inject garbage at a random point
          val garbage = Seq("((", "))", "'", "BY BY", ";;", "=", "foreach",
            "..", "$", "}{", "matches", "seq(")(rnd.nextInt(12))
          val i = rnd.nextInt(script.length)
          script.take(i) + " " + garbage + " " + script.drop(i)
        case _ => // duplicate a random chunk
          val i = rnd.nextInt(script.length)
          script + "\n" + script.slice(i, math.min(script.length, i + 40))
      }
      failAfter(Span(10, Seconds)) { tryParse(mutated) }
    }
  }

  test("pure token soup parses or fails fast") {
    val rnd = new scala.util.Random(7777)
    val tokens = Seq("load", "foreach", "generate", "group", "by", "(", ")",
      "=", ";", "'x'", "42", "a", "matches", "seq", ",", "filter", "and",
      "not", "flatten", "::", "$0", "[", "]", "{", "}", "*", "..")
    for (round <- 1 to 200) {
      val soup = (1 to (3 + rnd.nextInt(40)))
        .map(_ => tokens(rnd.nextInt(tokens.size))).mkString(" ")
      failAfter(Span(10, Seconds)) { tryParse(soup) }
    }
  }

  test("deeply nested expressions parse without stack overflow or hang") {
    for (depth <- Seq(50, 200)) {
      val expr = "(" * depth + "x" + ")" * depth
      failAfter(Span(10, Seconds)) {
        tryParse(s"b = filter a by $expr > 0;")
      }
    }
  }
}
