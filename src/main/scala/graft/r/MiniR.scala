package graft.r

import scala.collection.mutable

/** Builtin interpreter for the R-matrix subset the reference's RSCRIPT
  * scripts use (reference: op/RScript.scala + sparklib RScriptOp.scala,
  * which feed the relation to an in-JVM R bridge as matrix `inp`).
  *
  * This environment ships no R runtime, so graft's RSCRIPT offers two
  * engines: an external `Rscript` process per partition
  * ([[graft.core.Pipe.rscript]], full R), and THIS builtin evaluator —
  * enough R to run the reference's own integration scripts honestly on the
  * JVM, with `fpc::dbscan` backed by a real DBSCAN implementation
  * ([[graft.ml.Dbscan]]). Supported surface (documented, not hidden):
  *
  *   - statements split on `;`, assignment via `=` or `<-`
  *   - `library(pkg)` as a no-op (package functions are built in)
  *   - numeric literals incl. `.3`, `5L`, scientific notation
  *   - elementwise `+ - * /` with scalar broadcasting, unary minus
  *   - `m$field` list access
  *   - calls: `dbscan(m, eps=, MinPts=)` (returns a list with `$cluster`,
  *     0 = noise, matching fpc), `cbind`, `rbind`, `data.frame`,
  *     `data.matrix`, `as.matrix`, `t`, `nrow`, `ncol`
  *
  * Anything outside this subset fails loudly — no silent guessing.
  */
object MiniR {

  sealed trait RVal
  /** Row-major matrix. A scalar is a 1x1 matrix, an R vector an nx1. */
  final case class RMat(rows: Int, cols: Int, data: Array[Double]) extends RVal
  final case class RList(fields: Map[String, RVal]) extends RVal

  def scalar(v: Double): RMat = RMat(1, 1, Array(v))

  /** Evaluate `program` with `inp` bound to the input matrix; return the
    * value of `resObj` as rows. */
  def run(program: String, inp: Array[Array[Double]], resObj: String = "res")
      : Array[Array[Double]] = {
    val cols = if (inp.isEmpty) 0 else inp(0).length
    val env = mutable.Map[String, RVal](
      "inp" -> RMat(inp.length, cols, inp.flatten))
    splitStatements(program).foreach { st =>
      val s = st.trim
      if (s.nonEmpty) evalStatement(s, env)
    }
    env.get(resObj) match {
      case Some(RMat(r, c, d)) => Array.tabulate(r)(i => d.slice(i * c, i * c + c))
      case Some(other) => sys.error(s"MiniR: result '$resObj' is not a matrix: $other")
      case None => sys.error(s"MiniR: script never assigned '$resObj'")
    }
  }

  /** split on ';' outside quotes/parens-irrelevant (R has no ';' in our
    * literal subset, but keep quote awareness for safety) */
  private def splitStatements(p: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var quote: Char = 0
    p.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else if (ch == '\'' || ch == '"') { quote = ch; cur += ch }
      else if (ch == ';' || ch == '\n') { out += cur.toString; cur.clear() }
      else cur += ch
    }
    out += cur.toString
    out.toSeq
  }

  private val assignRe = """^\s*([A-Za-z._][\w._]*)\s*(?:<-|=)(?!=)\s*(.+)$""".r

  private def evalStatement(s: String, env: mutable.Map[String, RVal]): Unit =
    s match {
      case assignRe(name, rhs) => env(name) = eval(rhs, env)
      case _ => eval(s, env) // bare expression (library(...), etc.)
    }

  // ---- tiny recursive-descent expression parser/evaluator ----------------
  private def eval(src: String, env: mutable.Map[String, RVal]): RVal =
    new Parser(src, env).parseFully()

  private final class Parser(src: String, env: mutable.Map[String, RVal]) {
    private var pos = 0
    private def ws(): Unit = while (pos < src.length && src(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < src.length) src(pos) else '\u0000'
    private def fail(msg: String): Nothing =
      sys.error(s"MiniR: $msg at ${pos} in: $src")

    def parseFully(): RVal = {
      val v = expr(); ws()
      if (pos < src.length) fail(s"trailing input '${src.substring(pos)}'")
      v
    }

    private def expr(): RVal = {
      var l = term()
      ws()
      while (peek == '+' || peek == '-') {
        val op = peek; pos += 1
        val r = term()
        l = zipOp(l, r, if (op == '+') _ + _ else _ - _)
        ws()
      }
      l
    }

    private def term(): RVal = {
      var l = factor()
      ws()
      while (peek == '*' || peek == '/') {
        val op = peek; pos += 1
        val r = factor()
        l = zipOp(l, r, if (op == '*') _ * _ else _ / _)
        ws()
      }
      l
    }

    private def factor(): RVal = {
      ws()
      val base: RVal =
        if (peek == '-') { pos += 1; zipOp(scalar(0.0), factor(), _ - _) }
        else if (peek == '(') {
          pos += 1; val v = expr(); ws()
          if (peek != ')') fail("expected )"); pos += 1; v
        } else if (peek.isDigit ||
            (peek == '.' && pos + 1 < src.length && src(pos + 1).isDigit))
          number()
        // dot-LEADING names ('.m', '.Machine') are idiomatic R identifiers
        else if (peek.isLetter || peek == '.') identOrCall()
        else fail(s"unexpected '$peek'")
      postfix(base)
    }

    private def postfix(v0: RVal): RVal = {
      var v = v0; ws()
      while (peek == '$') {
        pos += 1
        val f = ident()
        v = v match {
          case RList(fs) => fs.getOrElse(f, fail(s"no field $$$f"))
          case _ => fail(s"$$$f on a non-list")
        }
        ws()
      }
      v
    }

    private def number(): RVal = {
      val start = pos
      while (pos < src.length &&
        (src(pos).isDigit || src(pos) == '.' || src(pos) == 'e' || src(pos) == 'E' ||
          ((src(pos) == '+' || src(pos) == '-') && pos > start &&
            (src(pos - 1) == 'e' || src(pos - 1) == 'E')))) pos += 1
      val txt = src.substring(start, pos)
      if (peek == 'L') pos += 1 // R integer suffix
      scalar(txt.toDouble)
    }

    private def ident(): String = {
      ws()
      val start = pos
      while (pos < src.length && (src(pos).isLetterOrDigit || src(pos) == '.' ||
        src(pos) == '_')) pos += 1
      if (pos == start) fail("expected identifier")
      src.substring(start, pos)
    }

    private def identOrCall(): RVal = {
      val name = ident()
      ws()
      if (peek == '(') {
        pos += 1
        // library(pkg): the arg is a package name, not a variable — skip it
        if (name == "library") {
          while (pos < src.length && src(pos) != ')') pos += 1
          if (peek != ')') fail("expected )"); pos += 1
          return scalar(0.0)
        }
        val named = mutable.Map.empty[String, RVal]
        val positional = mutable.ArrayBuffer.empty[RVal]
        ws()
        if (peek != ')') {
          var done = false
          while (!done) {
            // lookahead for `name =` (not `==`)
            val save = pos
            val argName: Option[String] =
              if (peek.isLetter || peek == '.') {
                val n = ident(); ws()
                if (peek == '=' && (pos + 1 >= src.length || src(pos + 1) != '=')) {
                  pos += 1; Some(n)
                } else { pos = save; None }
              } else None
            val v = expr()
            argName match {
              case Some(n) => named(n) = v
              case None => positional += v
            }
            ws()
            if (peek == ',') { pos += 1; ws() } else done = true
          }
        }
        if (peek != ')') fail("expected )"); pos += 1
        call(name, positional.toSeq, named.toMap)
      } else env.getOrElse(name, fail(s"undefined variable $name"))
    }

    private def call(name: String, args: Seq[RVal], named: Map[String, RVal]): RVal =
      name match {
        case "dbscan" =>
          val m = asMat(args.headOption.getOrElse(fail("dbscan needs data")))
          val eps = asScalar(named.getOrElse("eps", fail("dbscan needs eps=")))
          val minPts = asScalar(named.getOrElse("MinPts", scalar(5.0))).toInt
          val pts = Array.tabulate(m.rows)(i => m.data.slice(i * m.cols, i * m.cols + m.cols))
          val labels = graft.ml.Dbscan.fit(pts, eps, minPts)
          RList(Map("cluster" -> RMat(m.rows, 1, labels.map(_.toDouble))))
        case "cbind" =>
          val mats = args.map(asMat)
          if (mats.isEmpty) fail("cbind: needs at least one argument")
          val nr = mats.map(_.rows).max
          val bcast = mats.map { m =>
            if (m.rows == nr) m
            else if (m.rows == 1) RMat(nr, m.cols, Array.tabulate(nr * m.cols)(i => m.data(i % m.cols)))
            else fail(s"cbind: ${m.rows} rows vs $nr")
          }
          val nc = bcast.map(_.cols).sum
          val out = new Array[Double](nr * nc)
          var base = 0
          bcast.foreach { m =>
            var i = 0
            while (i < nr) {
              System.arraycopy(m.data, i * m.cols, out, i * nc + base, m.cols)
              i += 1
            }
            base += m.cols
          }
          RMat(nr, nc, out)
        case "rbind" =>
          val mats = args.map(asMat)
          if (mats.isEmpty) fail("rbind: needs at least one argument")
          val nc = mats.head.cols
          if (mats.exists(_.cols != nc)) fail("rbind: ragged cols")
          RMat(mats.map(_.rows).sum, nc, mats.toArray.flatMap(_.data))
        case "data.frame" | "data.matrix" | "as.matrix" =>
          if (args.length == 1) asMat(args.head)
          else call("cbind", args, named)
        case "t" =>
          val m = asMat(args.head)
          RMat(m.cols, m.rows,
            Array.tabulate(m.cols * m.rows)(i => m.data((i % m.rows) * m.cols + i / m.rows)))
        case "nrow" => scalar(asMat(args.head).rows.toDouble)
        case "ncol" => scalar(asMat(args.head).cols.toDouble)
        case other => fail(s"unsupported function $other")
      }
  }

  private def asMat(v: RVal): RMat = v match {
    case m: RMat => m
    case other => sys.error(s"MiniR: expected matrix, got $other")
  }
  private def asScalar(v: RVal): Double = v match {
    case RMat(1, 1, d) => d(0)
    case other => sys.error(s"MiniR: expected scalar, got $other")
  }

  /** elementwise with scalar/row broadcasting (R recycling for the shapes
    * our subset produces) */
  private def zipOp(l: RVal, r: RVal, f: (Double, Double) => Double): RVal =
    (asMat(l), asMat(r)) match {
      case (a, b) if a.rows == b.rows && a.cols == b.cols =>
        RMat(a.rows, a.cols, Array.tabulate(a.data.length)(i => f(a.data(i), b.data(i))))
      case (a, RMat(1, 1, s)) =>
        RMat(a.rows, a.cols, a.data.map(f(_, s(0))))
      case (RMat(1, 1, s), b) =>
        RMat(b.rows, b.cols, b.data.map(f(s(0), _)))
      case (a, b) =>
        sys.error(s"MiniR: shape mismatch ${a.rows}x${a.cols} vs ${b.rows}x${b.cols}")
    }
}
