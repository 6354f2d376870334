package graft

import org.apache.spark.sql.functions._
import graft.text.Url

class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(s: String): String =
    Seq(s).toDF("u").select(Url.canonicalizeUrl(col("u")).as("v"))
      .head().getString(0)

  test("scheme/host lowercase, default ports dropped, fragment dropped") {
    assert(canon("HTTP://Example.COM:80/A/b?x=1#frag") ==
      "http://example.com/A/b?x=1")
    assert(canon("HTTPS://EX.org:443/") == "https://ex.org/")
    // non-default and cross-scheme ports survive
    assert(canon("http://ex.com:8080/p") == "http://ex.com:8080/p")
    assert(canon("http://ex.com:443/p") == "http://ex.com:443/p")
    assert(canon("https://ex.com:80/p") == "https://ex.com:80/p")
  }

  test("tracker params stripped in every position; separators re-collapse") {
    assert(canon("http://e.com/p?utm_source=a&q=1") == "http://e.com/p?q=1")
    assert(canon("http://e.com/p?q=1&utm_source=a") == "http://e.com/p?q=1")
    assert(canon("http://e.com/p?a=1&gclid=x&b=2") == "http://e.com/p?a=1&b=2")
    // adjacent trackers, tracker-only query, tracker before fragment
    assert(canon("http://e.com/p?utm_a=1&utm_b=2&z=3") == "http://e.com/p?z=3")
    assert(canon("http://e.com/p?utm_source=o") == "http://e.com/p")
    assert(canon("http://e.com/p?fbclid=1#f") == "http://e.com/p")
    // a NON-tracker param that merely contains a tracker name survives
    assert(canon("http://e.com/p?myutm_source=keep") ==
      "http://e.com/p?myutm_source=keep")
  }

  test("empty path becomes /; query-only path gets a leading /") {
    assert(canon("http://e.com") == "http://e.com/")
    assert(canon("http://e.com#f") == "http://e.com/")
    assert(canon("http://e.com?q=1") == "http://e.com/?q=1")
  }

  test("non-URL strings pass through trimmed and untouched") {
    assert(canon("  plain text  ") == "plain text")
    assert(canon("e.com/no-scheme?utm_source=x") ==
      "e.com/no-scheme?utm_source=x")
    assert(canon("mailto:a@b.com") == "mailto:a@b.com")
  }

  test("canonicalization is idempotent across the planted rule classes") {
    val urls = Seq(
      "HTTP://Example.COM:80/path/Page?id=7&utm_source=x#frag",
      "https://WWW.Example.org:443/?gclid=abc&q=1",
      "http://example.net/a/b", "https://sub.Example.com/p?a=1&fbclid=z&b=2",
      "http://example.com:8080/Keep:Port?x=1", "  no-scheme.com?utm_b=1 ",
      "http://Example.com#only", "https://e.com/p?utm_source=a&utm_term=b")
    val once = urls.map(canon)
    assert(once.map(canon) == once)
  }

  test("dialect builtin CANONICAL_URL routes to the same expression") {
    val out = graft.piglatin.PigScript.query(spark,
      "r = FOREACH u GENERATE CANONICAL_URL(raw) AS canon;", "r",
      tables = Map("u" ->
        Seq("HTTP://E.COM:80/a?utm_source=x&k=1#f").toDF("raw")))
    assert(out.as[String].collect().toSeq == Seq("http://e.com/a?k=1"))
  }
}
