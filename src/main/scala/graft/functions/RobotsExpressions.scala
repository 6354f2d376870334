package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt crawl-policy evaluation (RFC 9309 core subset): is `path`
  * fetchable for `agent` under `robotsTxt`?
  *
  * Parsing: line-oriented, `#` comments stripped, keys case-insensitive,
  * a GROUP is one or more consecutive `User-agent` lines followed by its
  * `Allow`/`Disallow` rules (a `User-agent` line after rules starts a
  * new group — the RFC grouping). Group selection: exact agent-token
  * match (case-insensitive) if present, else the `*` group, else
  * everything is allowed. Decision: the longest-path rule that prefix-
  * matches wins; at equal length Allow wins; no matching rule allows.
  * Empty `Disallow:` (allow-all idiom) contributes no rule. Literal
  * prefixes only — `*`/`$` pattern rules are out of the v1 contract
  * (documented; the reference crawl layer has no robots support at all).
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

  // (allow?, path) rules for the selected agent group
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[(Boolean, String)]]()

  private def parse(txt: String): Array[(Boolean, String)] = {
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
              scala.collection.mutable.ArrayBuffer[(Boolean, String)])]
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
              groups.last._2 += ((key == "allow", value))
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
      val (allow, rp) = rules(i)
      if (u.startsWith(rp)) {
        if (rp.length > bestLen ||
            (rp.length == bestLen && allow && !bestAllow)) {
          bestLen = rp.length
          bestAllow = allow
        }
      }
      i += 1
    }
    bestAllow
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RobotsAllowedExpr =
    copy(path = newChildren(0), robotsTxt = newChildren(1))
}
