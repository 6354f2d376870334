package graft

import org.apache.spark.sql.functions._
import graft.text.Html

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    """<html><head><title>T</title><script>var x=1;</script></head>""" +
    """<body><nav><a href="/">Home</a> | <a href="/about">About</a></nav>""" +
    """<!-- c --><div id="m"><p>Hello &amp; welcome</p>""" +
    """<p>Second  para</p></div>""" +
    """<footer>&copy; 2026 Ex &lt;tag&gt;</footer></body></html>"""

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(page).toDF("h").select(c.as("v")).head().getString(0)

  test("extractText drops head/script/comments, breaks blocks, decodes") {
    assert(one(Html.extractText(col("h"))) ==
      "Home | About\n\nHello & welcome\n\nSecond para\n\n(c) 2026 Ex <tag>")
  }

  test("links pulls hrefs in order; single or double quoted") {
    val ls = Seq(page).toDF("h")
      .select(Html.links(col("h")).as("v")).head().getSeq[String](0)
    assert(ls == Seq("/", "/about"))
    val mixed = """<a href='one'>x</a><A HREF="two">y</A>"""
    val ls2 = Seq(mixed).toDF("h")
      .select(Html.links(col("h")).as("v")).head().getSeq[String](0)
    assert(ls2 == Seq("one", "two"))
  }

  test("linkDensity = anchor chars over visible chars, script excluded") {
    val d = Seq(page).toDF("h")
      .select(Html.linkDensity(col("h")).as("v")).head().getDouble(0)
    // anchors: "Home"+"About" = 9; visible (head/script/comment stripped,
    // tags stripped, entities UNdecoded): 12 + 19 + 12 + 26 = 69
    assert(math.abs(d - 9.0 / 69.0) < 1e-12)
    val navOnly = """<div><a href="/">AllLinks</a></div>"""
    val d2 = Seq(navOnly).toDF("h")
      .select(Html.linkDensity(col("h")).as("v")).head().getDouble(0)
    assert(d2 == 1.0)
    val empty = Seq("<p></p>").toDF("h")
      .select(Html.linkDensity(col("h")).as("v")).head().getDouble(0)
    assert(empty == 0.0)
  }

  test("cleanPages gates on density and min length") {
    val df = Seq(
      (1L, "<p>a long enough prose paragraph here</p>"),
      (2L, """<p><a href="/">links</a> <a href="/b">only</a> x</p>"""),
      (3L, "<p></p>")).toDF("id", "h")
    val kept = Html.cleanPages(df, "h", maxLinkDensity = 0.5, minChars = 3)
      .select("id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L)))
  }

  test("entity decode is idempotent-safe: escaped text round-trips") {
    val texts = Seq("a & b", "x<y>z", "keep &nbsp; literal? &amp; more",
      "5 &lt; 6 &gt; 4")
    val df = texts.toDF("t")
    val esc = replace(replace(replace(col("t"),
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    val out = df.select(
      Html.extractText(concat(lit("<p>"), esc, lit("</p>"))).as("v"))
      .as[String].collect()
    // whitespace collapse turns the double space in "&nbsp; literal" case
    val expect = texts.map(t => t.replaceAll("[ \t]+", " ").trim)
    assert(out.toSeq == expect)
  }
}
