package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training-text extraction — the step between a WARC crawl
  * segment and every downstream text operator (quality, dedup, langid).
  *
  * Not a reference operator (the reference ingests delimited/JSON text
  * only); first-class here because a 100 TB pretraining corpus arrives
  * as markup, and "strip the boilerplate" is the single highest-volume
  * transform in the whole pipeline.
  *
  * Everything is a chain of built-in string/regexp functions — fully
  * codegen'd, no UDFs, and each rule is expressible verbatim in ANSI
  * engines (the DuckDB oracle replays the identical chain), so the
  * extraction is auditable rule by rule. The per-row cost is linear in
  * the markup length and runs inside WholeStageCodegen; at cluster
  * scale this is a map-only stage with zero shuffle.
  */
object Html {

  /** Non-content blocks dropped wholesale (scripts, styles, head,
    * templates, SVG internals). Case-insensitive, dot-matches-newline.
    * `private[graft]` so the DuckDB oracle generates its replay chain
    * from the SAME rule constants (no drift). */
  private[graft] val dropBlocks = Seq("script", "style", "noscript",
    "template", "head", "svg")

  /** Tags whose boundary implies a line break in the rendered text. */
  private[graft] val blockTags = "p|div|br|hr|li|ul|ol|dl|dt|dd|h[1-6]|tr|td|th" +
    "|table|thead|tbody|section|article|header|footer|nav|aside|figure" +
    "|figcaption|blockquote|pre|form|fieldset|address|main|details|summary"

  /** Comments + non-content blocks removed — the shared first pass of
    * [[extractText]] and [[linkDensity]]'s denominator. */
  private def stripNonContent(html: Column): Column = {
    var c = regexp_replace(html, "(?s)<!--.*?-->", "")
    for (t <- dropBlocks)
      c = regexp_replace(c, s"(?is)<$t\\b[^>]*>.*?</$t>", "")
    c
  }

  /** Strip markup down to visible text: comments and non-content blocks
    * removed, block-tag boundaries become newlines, inline tags vanish,
    * the common named entities decode, whitespace collapses. */
  def extractText(html: Column): Column = {
    var c = stripNonContent(html)
    c = regexp_replace(c, s"(?i)</?($blockTags)\\b[^>]*>", "\n")
    c = regexp_replace(c, "<[^>]+>", "")
    c = decodeEntities(c)
    collapseWs(c)
  }

  /** The named entities worth decoding without an entity table.
    * `&amp;` is applied LAST (separately) so freshly decoded text can't
    * re-decode. */
  private[graft] val namedEntities = Seq("&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&apos;" -> "'", "&#39;" -> "'", "&nbsp;" -> " ",
    "&copy;" -> "(c)", "&mdash;" -> "--", "&ndash;" -> "-",
    "&hellip;" -> "...")

  private[text] def decodeEntities(c0: Column): Column = {
    var c = c0
    for ((e, r) <- namedEntities) c = replace(c, lit(e), lit(r))
    replace(c, lit("&amp;"), lit("&"))
  }

  /** Collapse runs of spaces/tabs, trim line edges, bound blank runs at
    * one empty line, trim the ends. */
  private[text] def collapseWs(c0: Column): Column = {
    var c = regexp_replace(c0, "[ \\t]+", " ")
    c = regexp_replace(c, " ?\\n ?", "\n")
    c = regexp_replace(c, "\\n{3,}", "\n\n")
    regexp_replace(c, "^\\s+|\\s+$", "")
  }

  /** All hyperlink targets (`href` values of `<a>` tags), in document
    * order — the input to URL filtering / host frequency audits. */
  def links(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*?href\\s*=\\s*[\"']([^\"']*)[\"']"), lit(1))

  /** Lower-cased host of an absolute URL ('' for relative links) —
    * feeds the dominant-domain audit ([[graft.core.HeavyHitters]] over
    * a link table) and blocklist joins. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))

  /** Anchor-text character mass. */
  private def anchorChars(html: Column): Column =
    aggregate(
      transform(
        regexp_extract_all(html, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
        a => length(regexp_replace(a, "<[^>]+>", ""))),
      lit(0), (acc, x) => acc + x)

  /** Fraction of the visible text living inside anchors — the classic
    * boilerplate signal (nav bars and link farms score near 1, prose
    * near 0). Returns a double in [0, 1]. */
  def linkDensity(html: Column): Column = {
    val total = length(regexp_replace(stripNonContent(html), "<[^>]+>", ""))
    least(lit(1.0),
      anchorChars(html).cast("double") /
        greatest(total.cast("double"), lit(1.0)))
  }

  /** Drop rows whose `hostCol` sits on the blocklist — the UT1-style
    * domain filter every crawl pipeline runs. Blocklists are small
    * (≤ a few million hosts) against a corpus of billions: BROADCAST
    * anti-join, so the corpus never shuffles. */
  def filterByHostBlocklist(df: org.apache.spark.sql.DataFrame,
                            hostCol: Column,
                            blocked: org.apache.spark.sql.DataFrame,
                            blockedCol: String): org.apache.spark.sql.DataFrame =
    df.join(
      broadcast(blocked.select(col(blockedCol).as("__blocked_host"))
        .distinct()),
      hostCol === col("__blocked_host"), "left_anti")

  /** Gate a corpus of raw markup into clean text: extract, drop pages
    * whose link density exceeds `maxLinkDensity` or whose extracted
    * text is shorter than `minChars`. Map-only; composes ahead of the
    * quality/dedup operators. */
  def cleanPages(df: org.apache.spark.sql.DataFrame, htmlCol: String,
                 outCol: String = "text", maxLinkDensity: Double = 0.5,
                 minChars: Int = 1): org.apache.spark.sql.DataFrame =
    df.withColumn(outCol, extractText(col(htmlCol)))
      .withColumn("link_density", linkDensity(col(htmlCol)))
      .where(col("link_density") <= maxLinkDensity &&
             length(col(outCol)) >= minChars)
}
