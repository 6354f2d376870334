package graft

import org.apache.spark.sql.functions._
import graft.text.Robots

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def allowed(path: String, robots: String,
                      agent: String = "graftbot"): Boolean =
    Seq((path, robots)).toDF("p", "r")
      .select(Robots.isAllowed(col("p"), col("r"), agent).as("a"))
      .head().getBoolean(0)

  private val standard =
    """# comment line
      |User-agent: OtherBot
      |Disallow: /
      |
      |User-Agent: GraftBot
      |Disallow: /private
      |Allow: /private/pub
      |Disallow: /tmp
      |Disallow:
      |Crawl-delay: 5
      |""".stripMargin

  test("longest prefix wins; Allow beats Disallow on ties; no match allows") {
    assert(!allowed("/private/secret", standard))
    assert(allowed("/private/pub/x", standard)) // deeper Allow overrides
    assert(!allowed("/tmp/x", standard))
    assert(allowed("/open/x", standard))        // no rule matches
    val tie = "User-agent: *\nAllow: /a\nDisallow: /a\n"
    assert(allowed("/a/x", tie))                // equal length → Allow
  }

  test("group selection: exact agent over *, decoy groups ignored, " +
      "unknown agent falls to *, no group at all allows") {
    assert(allowed("/anything", standard))      // OtherBot's deny ignored
    val starOnly = "User-agent: *\nDisallow: /x\n"
    assert(!allowed("/x/1", starOnly))
    assert(allowed("/y", starOnly))
    // agent not listed and no * group → everything allowed
    val foreign = "User-agent: SomeoneElse\nDisallow: /\n"
    assert(allowed("/x", foreign))
    assert(allowed("/x", ""))                   // empty robots.txt
  }

  test("hostile formatting: CRLF, mixed case, inline comments, blank " +
      "lines, empty Disallow, multi-agent groups") {
    val hostile = "user-AGENT: a\r\nUser-agent: GRAFTBOT\r\n" +
      "  DISALLOW :  /q  # trailing comment\r\n\r\nDisallow:\r\n"
    // "DISALLOW :" has a space before the colon — key parse still works
    // because we split on the FIRST colon and trim the key
    assert(!allowed("/q/1", hostile))
    assert(allowed("/r", hostile))
    // a User-agent line AFTER rules starts a NEW group (RFC grouping)
    val twoGroups = "User-agent: graftbot\nDisallow: /a\n" +
      "User-agent: other\nDisallow: /b\n"
    assert(!allowed("/a/x", twoGroups))
    assert(allowed("/b/x", twoGroups))          // other group's rule
  }

  test("dialect ROBOTS_ALLOWED routes with and without the agent arg") {
    val df = Seq(("/private/x", standard), ("/open/x", standard))
      .toDF("p", "r")
    val out = graft.piglatin.PigScript.run(spark,
      """b = FOREACH a GENERATE p,
        |    ROBOTS_ALLOWED(p, r, 'graftbot') AS ours,
        |    ROBOTS_ALLOWED(p, r) AS star;
        |""".stripMargin, tables = Map("a" -> df))
      .relation("b").orderBy("p").collect()
    // graftbot: /open allowed, /private denied; *: no such group in
    // `standard` (OtherBot + GraftBot only) → everything allowed
    assert(out(0).getString(0) == "/open/x" && out(0).getBoolean(1))
    assert(!out(1).getBoolean(1))
    assert(out(0).getBoolean(2) && out(1).getBoolean(2))
  }

  test("RFC 9309 wildcards: * matches any run including /, and the " +
      "session-id class a literal matcher silently allows is denied") {
    val r = "User-agent: graftbot\nDisallow: /*?sid=\n"
    assert(!allowed("/page?sid=42", r))
    assert(!allowed("/a/b/c?sid=", r))           // * spans path segments
    assert(allowed("/page?id=42", r))            // ?sid= literal required
    assert(allowed("/sid=", r))                  // needs the '?' octet
    // multiple wildcards walk left to right
    val multi = "User-agent: graftbot\nDisallow: /a*/b*/c\n"
    assert(!allowed("/a1/b2/c", multi))
    assert(!allowed("/ax/y/bz/w/c3", multi))     // segments found in order
    assert(allowed("/b/a/c", multi))             // '/a' prefix missing
    assert(allowed("/a/c/b", multi))             // '/c' after '/b' missing
  }

  test("$ anchors only at pattern end; mid-pattern $ is a literal") {
    val r = "User-agent: graftbot\nDisallow: /dl/*.exe$\nAllow: /dl/\n" +
      "Disallow: /logout$\n"
    assert(!allowed("/dl/setup.exe", r))         // anchored deny (len 10)
    assert(allowed("/dl/setup.exe.txt", r))      // anchor fails → /dl/ allow
    assert(allowed("/dl/readme.md", r))
    assert(!allowed("/logout", r))               // exact page denied
    assert(allowed("/logout/extra", r))          // subtree unmatched → allow
    val midDollar = "User-agent: graftbot\nDisallow: /a$b\n"
    assert(!allowed("/a$b/c", midDollar))        // $ literal mid-pattern
    assert(allowed("/ab", midDollar))
  }

  test("specificity is pattern length as written: a longer wildcard " +
      "pattern outranks a shorter literal, and vice versa; Allow wins " +
      "wildcard ties") {
    // deny /*?sid= (7) vs allow /p (2): wildcard outranks
    val w = "User-agent: graftbot\nAllow: /p\nDisallow: /*?sid=\n"
    assert(!allowed("/p/1?sid=9", w))
    assert(allowed("/p/clean", w))
    // literal allow LONGER than the wildcard deny wins
    val l = "User-agent: graftbot\nDisallow: /*?sid=\n" +
      "Allow: /p/exempt?sid=\n"
    assert(allowed("/p/exempt?sid=ok", l))
    // equal-length patterns, one with a wildcard: Allow wins the tie
    val tie = "User-agent: graftbot\nDisallow: /ab*\nAllow: /a*b\n"
    assert(allowed("/ab", tie))                  // both match (len 4 each)
    // trailing-* and bare-prefix behave identically for matching but
    // the * still counts toward specificity
    val star = "User-agent: graftbot\nAllow: /q\nDisallow: /q*\n"
    assert(!allowed("/q/x", star))               // /q* (3) beats /q (2)
  }

  test("null path or robots body allows (absent robots = fetchable)") {
    val df = Seq((null.asInstanceOf[String], standard),
      ("/private/x", null.asInstanceOf[String]))
      .toDF("p", "r")
      .select(Robots.isAllowed(col("p"), col("r"), "graftbot").as("a"))
    assert(df.collect().forall(_.getBoolean(0)))
  }

  private def metaOf(robots: String, agent: String = "graftbot") = {
    val row = Seq(Tuple1(robots)).toDF("r")
      .select(Robots.sitemaps(col("r")).as("s"),
        Robots.crawlDelay(col("r"), agent).as("d")).head()
    (row.getSeq[String](0), if (row.isNullAt(1)) None
                            else Some(row.getDouble(1)))
  }

  test("sitemaps are global (any position), case-insensitive key, " +
      "case-preserved value, comments stripped, null body empty") {
    val body = "SITEMAP: https://a.example/S1.xml # seed\n" +
      "User-agent: graftbot\nDisallow: /x\n" +
      "sitemap: https://a.example/s2.xml\n" +
      "# Sitemap: https://a.example/commented.xml\n"
    val (sm, _) = metaOf(body)
    assert(sm == Seq("https://a.example/S1.xml", "https://a.example/s2.xml"))
    val nullRow = Seq(Tuple1(null.asInstanceOf[String])).toDF("r")
      .select(Robots.sitemaps(col("r")).as("s")).head()
    assert(nullRow.getSeq[String](0).isEmpty)
  }

  test("crawl-delay is group-scoped: exact agent over *, decoy group " +
      "skipped, missing/unparseable/negative -> NULL, first wins") {
    val body = "User-agent: OtherBot\nDisallow: /\nCrawl-delay: 99\n" +
      "User-agent: graftbot\nDisallow: /x\nCRAWL-DELAY: 2.5\n" +
      "Crawl-delay: 7\n" +                   // second line: first wins
      "User-agent: *\nCrawl-delay: 4\n"
    assert(metaOf(body)._2.contains(2.5))
    assert(metaOf(body, "unknownbot")._2.contains(4.0)) // falls to *
    val noDelay = "User-agent: graftbot\nDisallow: /x\n"
    assert(metaOf(noDelay)._2.isEmpty)
    val bad = "User-agent: graftbot\nCrawl-delay: soon\n"
    assert(metaOf(bad)._2.isEmpty)
    val neg = "User-agent: graftbot\nCrawl-delay: -3\n"
    assert(metaOf(neg)._2.isEmpty)
    assert(metaOf(null.asInstanceOf[String])._2.isEmpty)
  }

  test("dialect SITEMAPS and CRAWL_DELAY builtins route") {
    val body = "Sitemap: https://a.example/m.xml\n" +
      "User-agent: graftbot\nDisallow: /x\nCrawl-delay: 3\n"
    val out = graft.piglatin.PigScript.run(spark,
      """b = FOREACH a GENERATE SIZE(SITEMAPS(r)) AS n,
        |    CRAWL_DELAY(r, 'graftbot') AS d, CRAWL_DELAY(r) AS dstar;
        |""".stripMargin,
      tables = Map("a" -> Seq(Tuple1(body)).toDF("r")))
      .relation("b").head()
    assert(out.getLong(0) == 1L && out.getDouble(1) == 3.0)
    assert(out.isNullAt(2))   // no * group → null for the default agent
  }
}
