package graft

import org.apache.spark.sql.functions._
import graft.text.MultiMatch
import graft.functions.AhoCorasick

class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  private def matched(text: String, pats: Seq[String]): Seq[String] =
    Seq(text).toDF("t")
      .select(MultiMatch.matchAny(col("t"), pats).as("m"))
      .head().getSeq[String](0)

  private def counted(text: String, pats: Seq[String]): Long =
    Seq(text).toDF("t")
      .select(MultiMatch.matchCount(col("t"), pats).as("m"))
      .head().getLong(0)

  test("nested / overlapping / bordering patterns all surface") {
    val pats = Seq("hash join", "join", "ash jo", "sh", "absent")
    assert(matched("a hash join b", pats) ==
      Seq("hash join", "join", "ash jo", "sh"))
    // declaration order is the output order, not match position
    assert(matched("join first, hash join later", pats) ==
      Seq("hash join", "join", "ash jo", "sh"))
    assert(matched("nothing here", pats) == Seq.empty)
    assert(matched("", pats) == Seq.empty)
  }

  test("count mode counts every end position, overlaps included") {
    // "aa" in "aaaa": ends at 1,2,3 → 3; "aaa": ends at 2,3 → 2
    assert(counted("aaaa", Seq("aa")) == 3L)
    assert(counted("aaaa", Seq("aa", "aaa")) == 5L)
    // nested: "ab"+"b" each end at every 'b'
    assert(counted("abab", Seq("ab", "b")) == 4L)
    assert(counted("", Seq("x")) == 0L)
  }

  test("brute-force differential over random pattern sets and texts") {
    val rnd = new scala.util.Random(42)
    val alpha = "abc"
    def randStr(n: Int) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 60) {
      val pats = (0 until (1 + rnd.nextInt(6)))
        .map(_ => randStr(1 + rnd.nextInt(4))).distinct
      val text = randStr(rnd.nextInt(40))
      val ac = new AhoCorasick(pats.toArray)
      // brute truth: pattern presence + all (start,pattern) pairs
      val truthFlags = pats.map(text.contains(_))
      val truthCount = pats.map { p =>
        (0 to text.length - p.length)
          .count(i => text.regionMatches(i, p, 0, p.length)).toLong
      }.sum
      assert(ac.matchFlags(text).toSeq == truthFlags,
        s"flags: pats=$pats text=$text")
      assert(ac.countAll(text) == truthCount,
        s"count: pats=$pats text=$text")
    }
  }

  test("unicode (astral-plane) text scans correctly") {
    // surrogate-pair characters must not break char-level matching of
    // BMP patterns around them
    val pats = Seq("key", "𝒜𝒷")
    assert(matched("x 𝒜𝒷 key y", pats) == Seq("key", "𝒜𝒷"))
    assert(counted("𝒜𝒷𝒜𝒷", Seq("𝒜𝒷")) == 2L)
  }

  test("oracle twin agrees with engine on the planted query shape") {
    val pats = Seq("hash join", "join", "slow", "zqx absent")
    val sql = MultiMatch.matchAnySql("'scan slow hash join'", pats)
    // the SQL fragment lists patterns in declaration order; spot-check
    // the quoting and shape (full engine-vs-DuckDB equality is the
    // q_contains_any correctness-gate row)
    assert(sql.contains("'hash join', 'join', 'slow', 'zqx absent'"))
    assert(sql.startsWith("list_filter(["))
    assert(MultiMatch.matchAnySql("t", Seq("o'brien"))
      .contains("'o''brien'"))
  }

  test("dialect MATCH_ANY / MATCH_COUNT route to the automaton") {
    val df = Seq((1L, "hash join fast"), (2L, "no hits"))
      .toDF("id", "t")
    val out = graft.piglatin.PigScript.run(spark,
      """b = FOREACH a GENERATE id, MATCH_ANY(t, 'hash join', 'join') AS m,
        |    MATCH_COUNT(t, 'hash join', 'join') AS n;
        |""".stripMargin, tables = Map("a" -> df)).relation("b")
    val rows = out.orderBy("id").collect()
    assert(rows(0).getSeq[String](1) == Seq("hash join", "join"))
    assert(rows(0).getLong(2) == 2L)
    assert(rows(1).getSeq[String](1) == Seq.empty)
    assert(rows(1).getLong(2) == 0L)
  }
}
