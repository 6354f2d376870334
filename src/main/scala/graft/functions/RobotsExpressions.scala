package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType,
  DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt crawl-policy evaluation (RFC 9309): is `path` fetchable
  * for `agent` under `robotsTxt`?
  *
  * Parsing: line-oriented, `#` comments stripped, keys case-insensitive,
  * a GROUP is one or more consecutive `User-agent` lines followed by its
  * `Allow`/`Disallow` rules (a `User-agent` line after rules starts a
  * new group — the RFC grouping). Group selection: exact agent-token
  * match (case-insensitive) if present, else the `*` group, else
  * everything is allowed. Empty `Disallow:` (allow-all idiom)
  * contributes no rule.
  *
  * Rule patterns implement RFC 9309 §2.2.3 special characters:
  * `*` matches any run of characters (including `/`); a single `$` at
  * the END of the pattern anchors the match to the end of the path
  * (anywhere else `$` is a literal octet, the reference-parser
  * behavior); without `$` the pattern matches any path it is a
  * wildcard-prefix of. Decision: the MOST SPECIFIC matching rule wins,
  * specificity = octet length of the pattern as written (wildcards and
  * the anchor count — the robots.txt author's longer pattern is the
  * more deliberate one, the de-facto-standard priority); at equal
  * length Allow wins; no matching rule allows.
  *
  * Patterns are compiled ONCE at parse time into `*`-split segment
  * arrays; matching is the classic greedy glob walk (first segment
  * anchored with startsWith, middles placed leftmost with indexOf, an
  * anchored tail checked with endsWith + a no-overlap position bound) —
  * no regex engine, no backtracking blowup, O(|path|·segments) worst
  * case per rule.
  *
  * Per-host robots bodies repeat across a url table, so parses are
  * memoized per executor (bounded map keyed by the body, cleared at
  * capacity — robots bodies are small and hosts per task are few).
  */
case class RobotsAllowedExpr(path: Expression, robotsTxt: Expression,
                             agent: String)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(path, robotsTxt)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_robots_allowed"

  /** One compiled rule: `len` is the specificity (pattern octets as
    * written), `segs` the `*`-split literal segments of the pattern
    * body (anchor stripped), `anchored` whether a trailing `$` pinned
    * the pattern to the path end. */
  private case class Rule(allow: Boolean, len: Int,
                          segs: Array[String], anchored: Boolean)

  @transient private lazy val cache =
    new java.util.HashMap[String, Array[Rule]]()

  private def compile(allow: Boolean, pattern: String): Rule = {
    val anchored = pattern.endsWith("$")
    val body = if (anchored) pattern.dropRight(1) else pattern
    // split keeps empty segments ("*a" -> ["", "a"], "a*" -> ["a", ""]):
    // empties match trivially and keep the walk uniform
    Rule(allow, pattern.length, body.split("\\*", -1), anchored)
  }

  /** Does the compiled pattern match `path` (wildcard-prefix unless
    * anchored, full-suffix pin when anchored)? */
  private def matches(path: String, r: Rule): Boolean = {
    val segs = r.segs
    if (segs.length == 1) {
      // no '*': plain prefix, or exact match when anchored
      if (r.anchored) path == segs(0) else path.startsWith(segs(0))
    } else {
      if (!path.startsWith(segs(0))) return false
      var pos = segs(0).length
      val lastFloating = if (r.anchored) segs.length - 1 else segs.length
      var i = 1
      while (i < lastFloating) {
        val idx = path.indexOf(segs(i), pos)
        if (idx < 0) return false
        pos = idx + segs(i).length
        i += 1
      }
      if (r.anchored) {
        val last = segs(segs.length - 1)
        path.endsWith(last) && path.length - last.length >= pos
      } else true
    }
  }

  private def parse(txt: String): Array[Rule] = {
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
              scala.collection.mutable.ArrayBuffer[Rule])]
    var inAgents = false
    txt.split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer.empty,
                scala.collection.mutable.ArrayBuffer.empty))
              inAgents = true
            }
            groups.last._1 += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inAgents = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += compile(key == "allow", value)
          case _ => // crawl-delay, sitemap, unknown keys: ignored
        }
      }
    }
    val want = agent.toLowerCase(java.util.Locale.ROOT)
    val grp = groups.find(_._1.contains(want))
      .orElse(groups.find(_._1.contains("*")))
    grp.map(_._2.toArray).getOrElse(Array.empty)
  }

  override def eval(input: InternalRow): Any = {
    val p = path.eval(input)
    val t = robotsTxt.eval(input)
    if (p == null || t == null) return true
    val txt = t.asInstanceOf[UTF8String].toString
    var rules = cache.get(txt)
    if (rules == null) {
      if (cache.size > 1024) cache.clear()
      rules = parse(txt)
      cache.put(txt, rules)
    }
    val u = p.asInstanceOf[UTF8String].toString
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      // specificity prune before the walk: a shorter pattern can't win
      if ((r.len > bestLen || (r.len == bestLen && r.allow && !bestAllow))
          && matches(u, r)) {
        bestLen = r.len
        bestAllow = r.allow
      }
      i += 1
    }
    bestAllow
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RobotsAllowedExpr =
    copy(path = newChildren(0), robotsTxt = newChildren(1))
}

/** `Sitemap:` URL extraction from a robots.txt body — the crawl seed
  * discovery step (RFC 9309 §2.3 treats sitemap as an "other record";
  * by the sitemaps.org convention it is GLOBAL, not group-scoped, so
  * every sitemap line counts regardless of position). Keys are
  * case-insensitive; values keep their case (URLs are case-sensitive);
  * comments/blank lines stripped; null body → empty array. */
case class RobotsSitemapsExpr(robotsTxt: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(robotsTxt)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_robots_sitemaps"

  override def eval(input: InternalRow): Any = {
    val t = robotsTxt.eval(input)
    if (t == null) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    t.asInstanceOf[UTF8String].toString.split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0 && line.substring(0, i).trim
            .toLowerCase(java.util.Locale.ROOT) == "sitemap") {
        val v = line.substring(i + 1).trim
        if (v.nonEmpty) out += UTF8String.fromString(v)
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RobotsSitemapsExpr =
    copy(robotsTxt = newChildren(0))
}

/** `Crawl-delay:` extraction for an agent — the politeness interval a
  * frontier scheduler budgets per host. Group-scoped like Allow/
  * Disallow (the de-facto convention): the selected group is the exact
  * agent match else the `*` group, the same selection as
  * [[RobotsAllowedExpr]]. Returns NULL when the body is null, no group
  * matches, the group has no crawl-delay line, or the value does not
  * parse as a non-negative number. */
case class RobotsCrawlDelayExpr(robotsTxt: Expression, agent: String)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(robotsTxt)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_crawl_delay"

  override def eval(input: InternalRow): Any = {
    val t = robotsTxt.eval(input)
    if (t == null) return null
    // (agents, delay) per group — same grouping walk as the matcher:
    // consecutive User-agent lines open a group, any rule line closes it
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
              Option[Double])]
    var inAgents = false
    t.asInstanceOf[UTF8String].toString.split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer.empty, None))
              inAgents = true
            }
            groups.last._1 += value.toLowerCase(java.util.Locale.ROOT)
          case "crawl-delay" =>
            inAgents = false
            if (groups.nonEmpty && groups.last._2.isEmpty)
              groups(groups.size - 1) = (groups.last._1,
                scala.util.Try(value.toDouble).toOption.filter(_ >= 0))
          case _ => inAgents = false
        }
      }
    }
    val want = agent.toLowerCase(java.util.Locale.ROOT)
    val grp = groups.find(_._1.contains(want))
      .orElse(groups.find(_._1.contains("*")))
    grp.flatMap(_._2).map(Double.box).orNull
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RobotsCrawlDelayExpr =
    copy(robotsTxt = newChildren(0))
}
