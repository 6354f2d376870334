package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}

import graft.functions.RobotsAllowedExpr

/** robots.txt crawl-policy filtering — the fetch-permission gate of the
  * crawl layer (WARC ingest → HTML extraction → URL canonicalization →
  * blocklist → THIS). The usual shape: a per-host robots table joined to
  * the url frontier on host (hosts ≪ urls — broadcast), then this
  * per-row map decides fetchability. Parse memoized per executor since
  * robots bodies repeat per host. */
object Robots {

  /** True when `path` is fetchable for `agent` under `robotsTxt`
    * (RFC 9309: group selection exact-agent-else-`*`; rule patterns
    * with `*` wildcards and a trailing `$` end-anchor per §2.2.3; the
    * most specific (longest-as-written) matching rule wins, Allow wins
    * ties, no-rule and null inputs allow). */
  def isAllowed(path: Column, robotsTxt: Column,
                agent: String = "*"): Column =
    column(RobotsAllowedExpr(expression(path), expression(robotsTxt),
      agent))

  /** `Sitemap:` URLs declared anywhere in the body (global per the
    * sitemaps.org convention) — the crawl seed discovery step. */
  def sitemaps(robotsTxt: Column): Column =
    column(graft.functions.RobotsSitemapsExpr(expression(robotsTxt)))

  /** `Crawl-delay:` seconds for `agent` (group-scoped, exact-agent-
    * else-`*` selection; NULL when absent or unparseable) — the
    * politeness interval a frontier scheduler budgets per host. */
  def crawlDelay(robotsTxt: Column, agent: String = "*"): Column =
    column(graft.functions.RobotsCrawlDelayExpr(expression(robotsTxt),
      agent))
}
