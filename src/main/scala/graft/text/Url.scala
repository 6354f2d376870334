package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalize step every crawl pipeline runs
  * before URL-level dedup, frontier merging and link analysis (one page
  * reached as `HTTP://Example.COM:80/a?utm_source=x#top` and
  * `http://example.com/a` must collapse to ONE key, or the dedup rate
  * and the link graph are both wrong).
  *
  * Rules (all engine-side, one codegen'd expression, no UDF):
  *   1. trim; non-URL strings (no `scheme://host`) pass through trimmed
  *   2. scheme and host lowercase
  *   3. default ports dropped (`:80` for http, `:443` for https)
  *   4. fragment dropped
  *   5. tracking query params stripped (utm_*, gclid, fbclid, …,
  *      case-sensitive lowercase — the form trackers actually emit),
  *      separators re-collapsed, empty query dropped
  *   6. empty path becomes `/`
  *
  * The DuckDB oracle twin is generated from the SAME pattern constants
  * ([[canonicalizeUrlSql]]), so engine and oracle can only agree by
  * computing the same function. Patterns stay in the RE2 ∩ java.util.regex
  * intersection (no lookaround, no backrefs in patterns).
  */
object Url {

  /** Alternation of tracker query-param names (shared constant). */
  val trackingParams: String =
    "(?:utm_[a-z0-9_]*|gclid|dclid|fbclid|msclkid|yclid|igshid|twclid" +
      "|mc_eid|mc_cid|spm|_ga|_gl)"

  private val schemeHost = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+"

  def canonicalizeUrl(u: Column): Column = {
    val t = trim(u)
    val isUrl = t.rlike(schemeHost)
    val scheme = lower(regexp_extract(t, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(t,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    val host = when(scheme === "http",
        regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rest = regexp_extract(t, schemeHost + "([^#]*)", 1)
    val noTrack =
      regexp_replace(rest, s"([?&])$trackingParams=[^&#]*", "$1")
    val collapsed = regexp_replace(
      regexp_replace(noTrack, "\\?&+", "?"), "&&+", "&")
    val pathq0 = regexp_replace(collapsed, "[?&]+$", "")
    val pathq = when(pathq0 === "", lit("/"))
      .when(pathq0.startsWith("?"), concat(lit("/"), pathq0))
      .otherwise(pathq0)
    when(isUrl, concat(scheme, lit("://"), host, pathq)).otherwise(t)
  }

  /** DuckDB SQL computing the identical canonicalization of expression
    * `e` — generated from the same constants (oracle twin). */
  def canonicalizeUrlSql(e: String): String = {
    val t = s"trim($e)"
    val scheme = s"lower(regexp_extract($t, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    val hostport = s"lower(regexp_extract($t, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1))"
    val host =
      s"""CASE WHEN $scheme = 'http' THEN regexp_replace($hostport, ':80$$', '')
         WHEN $scheme = 'https' THEN regexp_replace($hostport, ':443$$', '')
         ELSE $hostport END"""
    val rest = s"regexp_extract($t, '$schemeHost([^#]*)', 1)"
    val noTrack =
      s"regexp_replace($rest, '([?&])$trackingParams=[^&#]*', '\\1', 'g')"
    val collapsed =
      s"regexp_replace(regexp_replace($noTrack, '\\?&+', '?', 'g'), '&&+', '&', 'g')"
    val pathq0 = s"regexp_replace($collapsed, '[?&]+$$', '')"
    val pathq = s"(CASE WHEN $pathq0 = '' THEN '/' " +
      s"WHEN $pathq0 LIKE '?%' THEN '/' || $pathq0 ELSE $pathq0 END)"
    s"""(CASE WHEN regexp_matches($t, '$schemeHost')
        THEN $scheme || '://' || ($host) || $pathq ELSE $t END)"""
  }
}
