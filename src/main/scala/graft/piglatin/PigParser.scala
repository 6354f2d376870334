package graft.piglatin

import scala.util.parsing.combinator.RegexParsers
import Ast._

/** Pig Latin parser (combinator-based). Grammar coverage mirrors the
  * reference dialect (reference: src/main/scala/dbis/piglet/parser/
  * PigParser.scala): the standard Pig batch statements plus the reference
  * extensions graft supports natively (ACCUMULATE, MATERIALIZE,
  * INTERSECTION, DIFFERENCE). Keywords are case-insensitive; aliases are
  * case-sensitive. `--` and C-style comments are whitespace.
  */
object PigParser extends RegexParsers {

  override protected val whiteSpace =
    """(\s|--.*|/\*(?s:.*?)\*/)+""".r

  private def kw(w: String): Parser[String] = s"(?i)\\b$w\\b".r ^^ (_ => w)

  private val ident: Parser[String] = """[A-Za-z_][A-Za-z0-9_]*""".r
  private val number: Parser[String] = """-?\d+(\.\d+)?([eE]-?\d+)?[LlFf]?""".r
  // single-token regexes: a `"'" ~> inner <~ "'"` split would let
  // RegexParsers' whitespace skipping swallow space-only literals like
  // PigStorage(' ')'s delimiter
  private val quoted: Parser[String] =
    """'[^']*'""".r ^^ (s => s.substring(1, s.length - 1))
  private val dquoted: Parser[String] =
    """"[^"]*"""".r ^^ (s => s.substring(1, s.length - 1))

  // ---- expressions ---------------------------------------------------------
  def expr: Parser[Expr] = orExpr

  private def orExpr: Parser[Expr] =
    andExpr ~ rep(kw("or") ~> andExpr) ^^ {
      case h ~ t => t.foldLeft(h)((a, b) => BinOp("or", a, b)) }

  private def andExpr: Parser[Expr] =
    notExpr ~ rep(kw("and") ~> notExpr) ^^ {
      case h ~ t => t.foldLeft(h)((a, b) => BinOp("and", a, b)) }

  private def notExpr: Parser[Expr] =
    kw("not") ~> notExpr ^^ Not.apply | comparison

  private def comparison: Parser[Expr] =
    additive ~ opt(
      (kw("is") ~> kw("not") ~> kw("null") ^^ (_ => ("isnotnull", Lit(null))) |
       kw("is") ~> kw("null") ^^ (_ => ("isnull", Lit(null))) |
       kw("matches") ~ additive ^^ { case _ ~ r => ("matches", r) } |
       ("==" | "!=" | "<=" | ">=" | "<" | ">") ~ additive ^^ {
         case op ~ r => (op, r) })) ^^ {
      case l ~ None => l
      case l ~ Some(("isnull", _)) => IsNull(l, negated = false)
      case l ~ Some(("isnotnull", _)) => IsNull(l, negated = true)
      case l ~ Some((op, r)) => BinOp(op, l, r)
    }

  private def additive: Parser[Expr] =
    multiplicative ~ rep(("+" | "-") ~ multiplicative) ^^ {
      case h ~ t => t.foldLeft(h) { case (a, op ~ b) => BinOp(op, a, b) } }

  private def multiplicative: Parser[Expr] =
    unary ~ rep(("*" | "/" | "%") ~ unary) ^^ {
      case h ~ t => t.foldLeft(h) { case (a, op ~ b) => BinOp(op, a, b) } }

  private def unary: Parser[Expr] =
    "-" ~> unary ^^ Neg.apply | atom

  private val typeNames = Seq("int", "long", "float", "double", "chararray",
    "bytearray", "boolean", "datetime")
  private def typeName: Parser[String] =
    typeNames.map(kw).reduce(_ | _)

  private def atom: Parser[Expr] =
    castExpr |
    kw("flatten") ~> "(" ~> expr <~ ")" ^^ Flatten.apply |
    kw("null") ^^ (_ => Lit(null)) |
    kw("true") ^^ (_ => Lit(true)) |
    kw("false") ^^ (_ => Lit(false)) |
    funcCall |
    fieldRef |
    posRef |
    literal |
    "*" ^^ (_ => Star) |
    // (e) is grouping; (e1, e2, ...) is Pig's tuple constructor
    "(" ~> rep1sep(expr, ",") <~ ")" ^^ {
      case Seq(one) => one
      case many => FuncCall("TOTUPLE", many) } |
    "{" ~> rep1sep(expr, ",") <~ "}" ^^ (es => FuncCall("TOBAG", es)) |
    "[" ~> rep1sep(expr, ",") <~ "]" ^^ (es => FuncCall("TOMAP", es))

  private def castExpr: Parser[Expr] =
    ("(" ~> typeName <~ ")") ~ atom ^^ { case t ~ e => CastExpr(t, e) }

  private def funcCall: Parser[Expr] =
    rep1sep(ident, ".") ~ ("(" ~> repsep(expr | "*" ^^ (_ => Star), ",") <~ ")") ^^ {
      case parts ~ args => FuncCall(parts.mkString(".").toUpperCase, args) }

  private def fieldRef: Parser[Expr] =
    ident ~ rep(("." | "::") ~> ident) ^^ { case h ~ t => FieldRef(h +: t) }

  private def posRef: Parser[Expr] =
    "$" ~> """\d+""".r ^^ (s => PosRef(s.toInt))

  private def literal: Parser[Expr] =
    (quoted | dquoted) ^^ (s => Lit(s)) |
    number ^^ { s =>
      val clean = s.stripSuffix("L").stripSuffix("l")
        .stripSuffix("F").stripSuffix("f")
      if (clean.contains('.') || clean.toLowerCase.contains('e'))
        Lit(clean.toDouble)
      else Lit(clean.toLong)
    }

  // ---- schema --------------------------------------------------------------
  private def fieldSchema: Parser[FieldSchema] =
    ident ~ opt(":" ~> (typeName |
      kw("map") <~ opt("[" ~ "]") |
      kw("bag") <~ opt(bagShape) |
      kw("tuple") <~ opt(tupleShape) |
      "(" ~ repsep(fieldSchema, ",") ~ ")" ^^ (_ => "tuple"))) ^^ {
      case n ~ t => FieldSchema(n, t.getOrElse("bytearray")) }

  private def tupleShape: Parser[Any] = "(" ~ repsep(fieldSchema, ",") ~ ")"
  private def bagShape: Parser[Any] =
    "{" ~ opt(ident ~ ":") ~ kw("tuple") ~ tupleShape ~ "}"

  private def schemaSpec: Parser[Seq[FieldSchema]] =
    "(" ~> repsep(fieldSchema, ",") <~ ")"

  // ---- statements ----------------------------------------------------------
  private def usingClause: Parser[(String, Seq[String])] =
    kw("using") ~> ident ~ opt("(" ~> repsep(quoted, ",") <~ ")") ^^ {
      case n ~ args => (n, args.getOrElse(Nil)) }

  private def load: Parser[Stmt] =
    (ident <~ "=" <~ kw("load")) ~ quoted ~ opt(usingClause) ~
      opt(kw("as") ~> schemaSpec) ^^ {
      case a ~ p ~ u ~ s => Load(a, p, u, s) }

  private def store: Parser[Stmt] =
    kw("store") ~> ident ~ (kw("into") ~> quoted) ~ opt(usingClause) ^^ {
      case a ~ p ~ u => Store(a, p, u) }

  // DISPLAY is the reference's pretty-print variant of DUMP (op/Display)
  private def dump: Parser[Stmt] =
    (kw("dump") | kw("display")) ~> ident ~ opt(kw("mute")) ^^ {
      case a ~ m => Dump(a, m.isDefined) }
  private def describe: Parser[Stmt] = kw("describe") ~> ident ^^ Describe.apply

  private def filter: Parser[Stmt] =
    (ident <~ "=" <~ kw("filter")) ~ ident ~ (kw("by") ~> expr) ^^ {
      case a ~ in ~ c => Filter(a, in, c) }

  private def genItem: Parser[GenItem] =
    expr ~ opt(kw("as") ~> (ident ~ opt(":" ~> typeName) |
      "(" ~> (ident ~ opt(":" ~> typeName)) <~ ")")) ^^ {
      case e ~ Some(n ~ t) => GenItem(e, Some(n), t)
      case e ~ None => GenItem(e, None) }

  private def nestedAssign: Parser[(String, NestedOp)] =
    (ident <~ "=") ~ (
      kw("distinct") ~> ident ^^ NDistinct.apply |
      kw("filter") ~> ident ~ (kw("by") ~> expr) ^^ {
        case r ~ c => NFilter(r, c) } |
      kw("order") ~> ident ~ (kw("by") ~> opt("$0" ^^ (_ => None) |
        ident ^^ (k => Some(k))) ~ opt(kw("desc") | kw("asc"))) ^^ {
        case r ~ (k ~ d) => NOrder(r, k.flatten, d.contains("desc")) } |
      kw("limit") ~> ident ~ number ^^ { case r ~ n => NLimit(r, n.toInt) } |
      fieldRef ^^ { case FieldRef(p) => NProj(p) }
    ) <~ ";" ^^ { case n ~ op => (n, op) }

  private def foreach: Parser[Stmt] =
    (ident <~ "=" <~ kw("foreach")) ~ ident ~ (
      kw("generate") ~> repsep(genItem, ",") ^^ (Left(_)) |
      ("{" ~> rep(nestedAssign) ~ (kw("generate") ~> repsep(genItem, ",")) <~
        opt(";") <~ "}") ^^ (Right(_))) ^^ {
      case a ~ in ~ Left(items) => Foreach(a, in, items)
      case a ~ in ~ Right(assigns ~ items) => ForeachNested(a, in, assigns, items)
    }

  private def keyList: Parser[Seq[Expr]] =
    "(" ~> rep1sep(expr, ",") <~ ")" | expr ^^ (Seq(_))

  private def group: Parser[Stmt] =
    (ident <~ "=" <~ (kw("group") | kw("cogroup"))) ~ rep1sep(
      ident ~ (kw("all") ^^ (_ => Left(())) | kw("by") ~> keyList ^^ (Right(_))),
      ",") ^^ {
      case a ~ List(in ~ Left(_)) => Group(a, in, Nil, all = true)
      case a ~ List(in ~ Right(ks)) => Group(a, in, ks, all = false)
      case a ~ ins => CoGroup(a, ins.map {
        case in ~ Right(ks) => (in, ks)
        case in ~ Left(_) => (in, Nil) })
    }

  private def join: Parser[Stmt] =
    (ident <~ "=" <~ kw("join")) ~
      rep1sep(ident ~ (kw("by") ~> keyList) ~
        opt((kw("left") | kw("right") | kw("full")) <~ opt(kw("outer"))), ",") ^^ {
      case a ~ parts =>
        val ins = parts.map { case in ~ ks ~ _ => (in, ks) }
        val jt = parts.flatMap { case _ ~ _ ~ t => t }.headOption
          .map { case "left" => "left"; case "right" => "right"; case _ => "full" }
          .getOrElse("inner")
        Join(a, ins, jt)
    }

  private def cross: Parser[Stmt] =
    (ident <~ "=" <~ kw("cross")) ~ rep1sep(ident, ",") ^^ {
      case a ~ ins => Cross(a, ins) }

  private def union: Parser[Stmt] =
    (ident <~ "=" <~ kw("union")) ~ opt(kw("onschema")) ~ rep1sep(ident, ",") ^^ {
      case a ~ on ~ ins => Union(a, ins, on.isDefined) }

  private def distinctS: Parser[Stmt] =
    (ident <~ "=" <~ kw("distinct")) ~ ident ^^ {
      case a ~ in => DistinctStmt(a, in) }

  private def limit: Parser[Stmt] =
    (ident <~ "=" <~ kw("limit")) ~ ident ~ number ^^ {
      case a ~ in ~ n => LimitStmt(a, in, n.toInt) }

  private def orderKey: Parser[(Expr, Boolean)] =
    (fieldRef | posRef) ~ opt(kw("desc") | kw("asc")) ^^ {
      case e ~ d => (e, d.contains("desc")) }

  private def orderBy: Parser[Stmt] =
    (ident <~ "=" <~ kw("order")) ~ ident ~ (kw("by") ~> rep1sep(orderKey, ",")) ^^ {
      case a ~ in ~ ks => OrderBy(a, in, ks) }

  private def sample: Parser[Stmt] =
    (ident <~ "=" <~ kw("sample")) ~ ident ~ number ^^ {
      case a ~ in ~ f => SampleStmt(a, in, f.toDouble) }

  private def split: Parser[Stmt] =
    kw("split") ~> ident ~ (kw("into") ~> rep1sep(
      ident ~ (kw("if") ~> expr) ^^ { case n ~ c => (n, Some(c)) } |
      ident ~ kw("otherwise") ^^ { case n ~ _ => (n, None) }, ",")) ^^ {
      case in ~ bs => SplitInto(in, bs) }

  private def rank: Parser[Stmt] =
    (ident <~ "=" <~ kw("rank")) ~ ident ~ opt(kw("by") ~> rep1sep(orderKey, ",")) ^^ {
      case a ~ in ~ ks => RankStmt(a, in, ks.getOrElse(Nil)) }

  private def accumulate: Parser[Stmt] =
    (ident <~ "=" <~ kw("accumulate")) ~ ident ~
      (kw("generate") ~> repsep(genItem, ",")) ^^ {
      case a ~ in ~ items => Accumulate(a, in, items) }

  private def intersection: Parser[Stmt] =
    // the reference spells it INTERSECTION; accept the short form too
    (ident <~ "=" <~ (kw("intersection") | kw("intersect"))) ~
      ident ~ ("," ~> ident) ^^ {
      case a ~ l ~ r => IntersectStmt(a, l, r) }

  private def difference: Parser[Stmt] =
    (ident <~ "=" <~ kw("difference")) ~ ident ~ ("," ~> ident) ^^ {
      case a ~ l ~ r => DifferenceStmt(a, l, r) }

  private def streamThrough: Parser[Stmt] =
    (ident <~ "=" <~ kw("stream")) ~ ident ~
      (kw("through") ~> rep1sep(ident, ".")) ~
      opt("(" ~> repsep(expr, ",") <~ ")") ~ opt(kw("as") ~> schemaSpec) ^^ {
      case a ~ in ~ parts ~ args ~ sch =>
        StreamThrough(a, in, parts.last,
          args.getOrElse(Nil), sch) }

  private def rscriptStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("rscript")) ~ ident ~ (kw("using") ~> quoted) ^^ {
      case a ~ in ~ code => RScriptStmt(a, in, code) }

  private def materialize: Parser[Stmt] =
    kw("materialize") ~> ident ^^ Materialize.apply

  private def setCmd: Parser[Stmt] =
    // value token must NOT swallow the statement terminator (fsCmd's
    // character class) — `set default_parallel 5;` keeps its ';'
    kw("set") ~> """[A-Za-z0-9_.]+""".r ~ (quoted | """[^;\s]+""".r) ^^ {
      case k ~ v => SetCmd(k, v) }

  // reference: op/cmd/HdfsCmd.scala — `fs -mkdir /data;` etc.
  private def fsCmd: Parser[Stmt] =
    kw("fs") ~> "-" ~> """[A-Za-z]+""".r ~ rep("""[^;\s]+""".r) ^^ {
      case c ~ ps => FsCmd(c, ps) }

  private def register: Parser[Stmt] =
    kw("register") ~> (quoted | """[^;\s]+""".r) ^^ Register.apply

  private def defineAlias: Parser[Stmt] =
    kw("define") ~> ident ~ ident ^^ { case n ~ t => DefineAlias(n, t) }

  // ---- reference extensions (CEP / streaming / RDF / spatial) --------------
  private def pat: Parser[Pat] =
    kw("seq") ~> "(" ~> rep1sep(pat, ",") <~ ")" ^^ PSeq.apply |
    kw("and") ~> "(" ~> rep1sep(pat, ",") <~ ")" ^^ PAnd.apply |
    kw("or") ~> "(" ~> rep1sep(pat, ",") <~ ")" ^^ POr.apply |
    kw("neg") ~> "(" ~> pat <~ ")" ^^ PNeg.apply |
    ident ^^ PSimple.apply

  private def timeUnit: Parser[String] =
    "(?i)\\b(seconds?|minutes?|hours?|days?)\\b".r ^^ (_.toLowerCase)

  private def matchEvent: Parser[Stmt] =
    (ident <~ "=" <~ kw("match_event")) ~ ident ~
      opt(kw("by") ~> ident) ~ (kw("pattern") ~> pat) ~
      (kw("with") ~> "(" ~> rep1sep((ident <~ ":") ~ expr ^^ {
        case n ~ e => (n, e) }, ",") <~ ")") ~
      opt(kw("mode") ~> ident) ~
      opt(kw("within") ~> number ~ timeUnit) ~
      opt(kw("reorder") ~> kw("by") ~> quoted) ^^ {
      case a ~ in ~ key ~ p ~ defs ~ mode ~ within ~ reorder =>
        val secs = within.map { case n ~ u =>
          val mult = u.stripSuffix("s") match {
            case "second" => 1L; case "minute" => 60L
            case "hour" => 3600L; case _ => 86400L
          }
          n.toLong * mult
        }.getOrElse(Long.MaxValue / 2000000L)
        MatchEvent(a, in, p, defs, mode.getOrElse("skip_till_next_match"),
          secs, key, reorder)
    }

  private def windowSpec: Parser[(Boolean, Long, String)] =
    kw("range") ~> number ~ timeUnit ^^ { case n ~ u => (false, n.toLong, u) } |
    kw("rows") ~> number ^^ (n => (true, n.toLong, ""))

  private def windowStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("window")) ~ ident ~ windowSpec ~
      opt(kw("slide") ~> windowSpec) ^^ {
      case a ~ in ~ ((rows, size, unit)) ~ slide =>
        val (_, ss, su) = slide.getOrElse((rows, size, unit))
        WindowStmt(a, in, rows, size, unit, ss, su)
    }

  private def socketRead: Parser[Stmt] =
    (ident <~ "=" <~ kw("socket_read")) ~ quoted ~
      opt(kw("mode") ~> ident) ~ opt(usingClause) ~
      opt(kw("as") ~> schemaSpec) ~
      opt(kw("timestamp") ~> "(" ~> fieldRef <~ ")") ^^ {
      case a ~ addr ~ mode ~ u ~ s ~ ts =>
        SocketRead(a, addr, mode.getOrElse("plain"), u, s,
          ts.map { case FieldRef(p) => p.mkString(".") })
    }

  private def socketWrite: Parser[Stmt] =
    kw("socket_write") ~> ident ~ (kw("to") ~> quoted) ~
      opt(kw("mode") ~> ident) ^^ {
      case in ~ addr ~ mode => SocketWrite(in, addr, mode.getOrElse("plain"))
    }

  private def rdfLoad: Parser[Stmt] =
    (ident <~ "=" <~ kw("rdfload")) ~ ("(" ~> quoted <~ ")") ~
      opt(kw("grouped") ~> kw("on") ~>
        (kw("subject") | kw("predicate") | kw("object"))) ^^ {
      case a ~ uri ~ g => RdfLoad(a, uri, g) }

  private def tuplify: Parser[Stmt] =
    (ident <~ "=" <~ kw("tuplify")) ~ ident ~ (kw("on") ~> (fieldRef | posRef)) ^^ {
      case a ~ in ~ on => TuplifyStmt(a, in, on) }

  // each constant form is ONE regex token: split tokens ("\"" ~> body)
  // would let the whitespace skipper (which also eats `--` comments) run
  // INSIDE the literal — a quoted " " would collapse to "" and an IRI
  // containing "--" would swallow the rest of the line
  private def tripleTerm: Parser[Either[String, String]] =
    "?" ~> ident ^^ (v => Left(v)) |
    "$" ~> """\d+""".r ^^ (n => Left(s"v$n")) |
    """"[^"]*"""".r ^^ (c => Right(c.substring(1, c.length - 1))) |
    // KEEP the angle brackets: RDFLOAD stores raw N-Triples tokens
    // ('<urn:x>'), so a stripped constant would silently match nothing
    """<[^>]*>""".r ^^ (c => Right(c))

  private def bgpFilter: Parser[Stmt] =
    (ident <~ "=" <~ kw("bgp_filter")) ~ ident ~
      (kw("by") ~> "{" ~> rep1sep(
        tripleTerm ~ tripleTerm ~ tripleTerm ^^ {
          case s ~ p ~ o => TriplePat(s, p, o) }, ".") <~ "}") ^^ {
      case a ~ in ~ pats => BgpFilter(a, in, pats) }

  /** `USING INDEX rtree(order=2)` style suffix — yields the method name
    * (`rtree` routes to the Z-order curve index, the Spark analog of a
    * bulk-loaded R-tree; anything else takes the grid-cell path). */
  private def indexClause: Parser[String] =
    kw("using") ~> opt(kw("index")) ~> ident <~
      opt("(" ~ repsep(ident ~ "=" ~ (number | ident), ",") ~ ")")

  private def spatialFilter: Parser[Stmt] =
    (ident <~ "=" <~ kw("spatial_filter")) ~ ident ~ (kw("by") ~> funcCall) <~
      opt(indexClause) ^^ {
      case a ~ in ~ (f: FuncCall) => SpatialFilterStmt(a, in, f) }

  private def spatialJoin: Parser[Stmt] =
    (ident <~ "=" <~ kw("spatial_join")) ~ ident ~ ("," ~> ident) ~
      (kw("on") ~> funcCall) <~ opt(indexClause) ^^ {
      case a ~ l ~ r ~ (f: FuncCall) => SpatialJoinStmt(a, l, r, f) }

  /** `b = ZIP a WITH INDEX` | `b = ZIP a, c, d` (reference zipStmt). */
  private def zipStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("zip")) ~ ident ~ (
      kw("with") ~> kw("index") ^^ (_ => Left(())) |
      rep1("," ~> ident) ^^ (Right(_))) ^^ {
      case a ~ in ~ Left(_) => ZipIndexStmt(a, in)
      case a ~ in ~ Right(others) => ZipBagsStmt(a, in +: others)
    }

  /** `b = CACHE a [MEMORY_ONLY|MEMORY_AND_DISK|...]` (reference cacheStmt). */
  private def cacheStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("cache")) ~ ident ~ opt(ident) ^^ {
      case a ~ in ~ mode => CacheStmt(a, in, mode) }

  /** `b = INDEX a ON field USING rtree(order=2)` (reference indexStmt). */
  private def indexStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("index")) ~ ident ~ (kw("on") ~> fieldRef) ~
      indexClause ^^ {
      case a ~ in ~ FieldRef(p) ~ m =>
        IndexStmt(a, in, p.mkString("."), m.toLowerCase) }

  /** `b = DELAY a BY (wtime, samplePct)` — wtime is an ISO-8601 duration
    * body ('0.5S', '2M') or plain milliseconds (reference delayStmt). */
  private def delayStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("delay")) ~ ident ~
      (kw("by") ~> "(" ~> (quoted ^^ (Left(_)) | number ^^ (Right(_))) ~
        ("," ~> number) <~ ")") ^^ {
      case a ~ in ~ (w ~ s) =>
        val ms = w match {
          case Left(iso) => java.time.Duration.parse(s"PT$iso").toMillis
          case Right(n) => n.toDouble.toLong
        }
        DelayStmt(a, in, ms, s.toDouble.toInt)
    }

  /** `b = SKYLINE a BY (price, quality MAX)` — Pareto-dominance filter
    * (graft dialect; dims minimize unless flagged MAX). */
  private def skylineStmt: Parser[Stmt] = {
    val dim = fieldRef ~ opt(kw("max") | kw("min")) ^^ {
      case FieldRef(p) ~ flag => (p.mkString("."), flag.contains("max")) }
    (ident <~ "=" <~ kw("skyline")) ~ ident ~
      (kw("by") ~> ("(" ~> rep1sep(dim, ",") <~ ")" | rep1sep(dim, ","))) ^^ {
      case a ~ in ~ dims => SkylineStmt(a, in, dims) }
  }

  private def visualizeStmt: Parser[Stmt] =
    kw("visualize") ~> ident ~ (kw("by") ~> (fieldRef | posRef)) ~
      (kw("into") ~> quoted) ~
      opt(kw("with") ~> kw("pointsize") ~> number) ~
      opt(kw("pointsonly")) ~
      (kw("as") ~> "(" ~> number ~ ("," ~> number) <~ ")") ^^ {
      case in ~ f ~ path ~ ps ~ po ~ (w ~ h) =>
        VisualizeStmt(in, f, path, ps.map(_.toDouble.toInt),
          w.toDouble.toInt, h.toDouble.toInt, pointsOnly = po.isDefined)
    }

  /** One `k=v` or bare-value param of a PARTITION method (reference
    * accepts both: `grid(partitionsPerDimension=4)` in its IT scripts,
    * positional constructor args in its codegen templates). */
  private def partitionParam: Parser[String] =
    (ident ~ "=" ~ (number | ident | quoted) ^^ {
      case k ~ _ ~ v => s"$k=$v" }) | number | ident | quoted

  private def partitionStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("partition")) ~ ident ~ (kw("on") ~> fieldRef) ~
      // `USING INDEX rtree(order=2)` stays accepted as the ADVISORY index
      // hint it always was (same as spatialFilter/spatialJoin) — tried
      // first so `index` never binds as a partition method name
      (opt(kw("using") ~> (
        kw("index") ~> ident ~ opt("(" ~> repsep(partitionParam, ",") <~ ")") ^^
          (_ => "grid" -> Seq.empty[String]) |
        ident ~ opt("(" ~> repsep(partitionParam, ",") <~ ")") ^^ {
          case mm ~ pp => mm.toLowerCase -> pp.getOrElse(Nil) }))) ^^ {
      case a ~ in ~ FieldRef(p) ~ m =>
        val (method, ps) = m.getOrElse("grid" -> Nil)
        PartitionStmt(a, in, p.mkString("."), method, ps) }

  /** `(k=v, …)` parameter list of the LLM-curation statements. */
  private def llmParams: Parser[Map[String, String]] =
    opt("(" ~> repsep(ident ~ "=" ~ (number | quoted | ident), ",") <~ ")") ^^
      (_.map(_.map { case k ~ _ ~ v => k.toLowerCase -> v }.toMap)
        .getOrElse(Map.empty))

  /** `b = DEDUP a BY doc_id, text USING minhash(threshold=0.5, …)`
    * (graft dialect — the LLM dedup layer, scriptable). */
  private def dedupStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("dedup")) ~ ident ~ (kw("by") ~> ident) ~
      ("," ~> ident) ~ (kw("using") ~> ident) ~ llmParams ^^ {
      case a ~ in ~ idF ~ cF ~ m ~ p =>
        DedupStmt(a, in, idF, cF, m.toLowerCase, p) }

  /** `b = QUALITY a BY text [USING gopher]` (graft dialect). */
  private def qualityStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("quality")) ~ ident ~ (kw("by") ~> ident) ~
      opt(kw("using") ~> ident) ^^ {
      case a ~ in ~ f ~ m =>
        QualityStmt(a, in, f, m.map(_.toLowerCase).getOrElse("score")) }

  /** `b = TOKENIZE_DOCS a BY text [USING bpe(merges=200)]` (graft
    * dialect; TOKENIZE stays the reference's per-field bag FUNCTION). */
  private def tokenizeStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("tokenize_docs")) ~ ident ~ (kw("by") ~> ident) ~
      opt((kw("using") ~> ident) ~ llmParams) ^^ {
      case a ~ in ~ f ~ m =>
        TokenizeStmt(a, in, f,
          m.map(_._1.toLowerCase).getOrElse("whitespace"),
          m.map(_._2).getOrElse(Map.empty)) }

  /** `b = DECONTAMINATE a BY id, text AGAINST bench BY bid, btext
    * [USING clean|report|fuzzy(…)]` (graft dialect). */
  private def decontaminateStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("decontaminate")) ~ ident ~ (kw("by") ~> ident) ~
      ("," ~> ident) ~ (kw("against") ~> ident) ~ (kw("by") ~> ident) ~
      ("," ~> ident) ~ opt((kw("using") ~> ident) ~ llmParams) ^^ {
      case a ~ in ~ idF ~ tF ~ bench ~ bId ~ bT ~ m =>
        DecontaminateStmt(a, in, idF, tF, bench, bId, bT,
          m.map(_._1.toLowerCase).getOrElse("clean"),
          m.map(_._2).getOrElse(Map.empty)) }

  /** `b = PACK a ON doc_id BY text INTO 2048` (graft dialect). */
  private def packStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("pack")) ~ ident ~ (kw("on") ~> ident) ~
      (kw("by") ~> ident) ~ (kw("into") ~> number) ^^ {
      case a ~ in ~ idF ~ f ~ n => PackStmt(a, in, idF, f, n.toLong) }

  /** `b = SPLIT_HASH a BY doc_id INTO train 80, val 10, test 10`
    * (graft dialect). */
  private def splitHashStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("split_hash")) ~ ident ~
      (kw("by") ~> rep1sep(ident, ",")) ~
      (kw("into") ~> rep1sep(ident ~ number, ",")) ^^ {
      case a ~ in ~ keys ~ ss =>
        SplitHashStmt(a, in, keys,
          ss.map { case n ~ p => n -> p.toInt }) }

  /** `b = SCORE a BY id, text [WITH weights] USING classifier(labels=y)`
    * (graft dialect). */
  private def scoreStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("score")) ~ ident ~ (kw("by") ~> ident) ~
      ("," ~> ident) ~ opt(kw("with") ~> ident) ~
      (kw("using") ~> ident) ~ llmParams ^^ {
      case a ~ in ~ idF ~ tF ~ w ~ m ~ p =>
        ScoreStmt(a, in, idF, tF, w, m.toLowerCase, p) }

  /** `b = PROFILE a ON c1, c2 [USING exact|sketch(rsd=…)]` (graft
    * dialect — the corpus audit pass, scriptable). */
  private def profileStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("profile")) ~ ident ~
      (kw("on") ~> rep1sep(ident, ",")) ~
      opt((kw("using") ~> ident) ~ llmParams) ^^ {
      case a ~ in ~ cs ~ m =>
        ProfileStmt(a, in, cs, m.map(_._1.toLowerCase).getOrElse("exact"),
          m.map(_._2).getOrElse(Map.empty)) }

  /** `b = HEAVY_HITTERS a BY col TOP 20 [USING sketch(capacity=…)]`
    * (graft dialect). */
  private def heavyStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("heavy_hitters")) ~ ident ~
      (kw("by") ~> ident) ~ (kw("top") ~> number) ~
      opt((kw("using") ~> ident) ~ llmParams) ^^ {
      case a ~ in ~ f ~ n ~ m =>
        HeavyStmt(a, in, f, n.toDouble.toInt,
          m.map(_._1.toLowerCase).getOrElse("exact"),
          m.map(_._2).getOrElse(Map.empty)) }

  /** `b = TEMPERATURE a BY lang ALPHA 0.5 KEY doc_id[, …];` (graft
    * dialect) — n^α group rebalancing. */
  private def temperatureStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("temperature")) ~ ident ~
      (kw("by") ~> ident) ~ (kw("alpha") ~> number) ~
      (kw("key") ~> rep1sep(ident, ",")) ^^ {
      case a ~ in ~ f ~ al ~ ks =>
        TemperatureStmt(a, in, f, al.toDouble, ks) }

  /** `b = TOP_FRAC a BY lang PCT 25 SCORE n_chars KEY doc_id[, …];`
    * (graft dialect) — best pct% of every group by score. */
  private def topFracStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("top_frac")) ~ ident ~
      (kw("by") ~> ident) ~ (kw("pct") ~> number) ~
      (kw("score") ~> ident) ~ (kw("key") ~> rep1sep(ident, ",")) ^^ {
      case a ~ in ~ f ~ p ~ sc ~ ks =>
        TopFracStmt(a, in, f, p.toDouble.toInt, sc, ks) }

  /** `b = OUTLIERS a BY grp ON x [K 3.0];` (graft dialect). */
  private def outliersStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("outliers")) ~ ident ~
      (kw("by") ~> ident) ~ (kw("on") ~> ident) ~
      opt(kw("k") ~> number) ^^ {
      case a ~ in ~ g ~ v ~ k =>
        OutliersStmt(a, in, g, v, k.map(_.toDouble).getOrElse(3.0)) }

  /** `d = DIFF a, b BY id ON content;` (graft dialect). */
  private def diffStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("diff")) ~ ident ~ ("," ~> ident) ~
      (kw("by") ~> ident) ~ (kw("on") ~> ident) ^^ {
      case a ~ ia ~ ib ~ k ~ c => DiffStmt(a, ia, ib, k, c) }

  /** `x = ASOF_JOIN l BY k[, …] ON ts, r BY k[, …] ON rts
    * [TOLERANCE n] [DIRECTION forward];` (graft dialect). */
  private def asofJoinStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("asof_join")) ~ ident ~
      (kw("by") ~> rep1sep(ident, ",")) ~ (kw("on") ~> ident) ~
      ("," ~> ident) ~ (kw("by") ~> rep1sep(ident, ",")) ~
      (kw("on") ~> ident) ~ opt(kw("tolerance") ~> number) ~
      opt(kw("direction") ~> ident) ^^ {
      case a ~ il ~ kl ~ tl ~ ir ~ kr ~ tr ~ tol ~ d =>
        AsofJoinStmt(a, il, kl, tl, ir, kr, tr,
          tol.map(_.toDouble.toLong), d.getOrElse("backward").toLowerCase) }

  /** `x = INTERVAL_JOIN p ON pt, i ON lo, hi WIDTH w [BY k1, …]
    * [INCLUSIVE];` (graft dialect). */
  private def intervalJoinStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("interval_join")) ~ ident ~
      (kw("on") ~> ident) ~ ("," ~> ident) ~ (kw("on") ~> ident) ~
      ("," ~> ident) ~ (kw("width") ~> number) ~
      opt(kw("by") ~> rep1sep(ident, ",")) ~ opt(kw("inclusive")) ^^ {
      case a ~ ip ~ pc ~ ii ~ lo ~ hi ~ w ~ ks ~ inc =>
        IntervalJoinStmt(a, ip, pc, ii, lo, hi, w.toDouble.toLong,
          ks.getOrElse(Nil), inc.isDefined) }

  /** `x = SESSIONIZE a BY key ON ts GAP micros;` (graft dialect). */
  private def sessionizeStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("sessionize")) ~ ident ~
      (kw("by") ~> ident) ~ (kw("on") ~> ident) ~
      (kw("gap") ~> number) ^^ {
      case a ~ in ~ k ~ ts ~ g =>
        SessionizeStmt(a, in, k, ts, g.toDouble.toLong) }

  /** `b = QUOTA_SAMPLE a BY grp TOP k KEY id[, …];` (graft dialect). */
  private def quotaSampleStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("quota_sample")) ~ ident ~
      (kw("by") ~> ident) ~ (kw("top") ~> number) ~
      (kw("key") ~> rep1sep(ident, ",")) ^^ {
      case a ~ in ~ g ~ k ~ ks =>
        QuotaSampleStmt(a, in, g, k.toDouble.toInt, ks) }

  /** `b = MIXTURE a BY lang TARGET 'en' 0.5, 'de' 0.25 KEY id[, …];`
    * (graft dialect). */
  private def mixtureStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("mixture")) ~ ident ~
      (kw("by") ~> ident) ~
      (kw("target") ~> rep1sep(quoted ~ number, ",")) ~
      (kw("key") ~> rep1sep(ident, ",")) ^^ {
      case a ~ in ~ g ~ ts ~ ks =>
        MixtureStmt(a, in, g,
          ts.map { case n ~ w => (n, w.toDouble) }, ks) }

  /** `o = OVERLAP a, b BY k [USING sketch];` (graft dialect). */
  private def overlapStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("overlap")) ~ ident ~ ("," ~> ident) ~
      (kw("by") ~> ident) ~ opt(kw("using") ~> ident) ^^ {
      case a ~ ia ~ ib ~ k ~ m =>
        OverlapStmt(a, ia, ib, k,
          m.map(_.toLowerCase).getOrElse("exact")) }

  /** `s = SCHEDULE f BY host ON url DELAY d [DEFAULT 1.0];` (graft
    * dialect). */
  private def scheduleStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("schedule")) ~ ident ~
      (kw("by") ~> ident) ~ (kw("on") ~> ident) ~
      (kw("delay") ~> ident) ~ opt(kw("default") ~> number) ^^ {
      case a ~ in ~ h ~ u ~ d ~ df =>
        ScheduleStmt(a, in, h, u, d,
          df.map(_.toDouble).getOrElse(1.0)) }

  /** `b = CLUSTER a BY vec INTO 8 [USING kmeans(iters=10, seed=42,
    * sample=2048)];` (graft dialect) — k-means topic/domain clustering
    * over an embedding column. */
  private def clusterStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("cluster")) ~ ident ~
      (kw("by") ~> ident) ~ (kw("into") ~> number) ~
      opt((kw("using") ~> ident) ~ llmParams) ^^ {
      case a ~ in ~ f ~ n ~ m =>
        ClusterStmt(a, in, f, n.toDouble.toInt,
          m.map(_._1.toLowerCase).getOrElse("kmeans"),
          m.map(_._2).getOrElse(Map.empty)) }

  /** `c = CONNECTED_COMPONENTS e BY id_a, id_b [MAXITER 10];`. */
  private def ccStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("connected_components")) ~ ident ~
      (kw("by") ~> ident) ~ ("," ~> ident) ~
      opt(kw("maxiter") ~> number) ^^ {
      case a ~ in ~ f1 ~ f2 ~ n =>
        CcStmt(a, in, f1, f2, n.map(_.toDouble.toInt).getOrElse(10)) }

  /** `r = PAGERANK e BY src, dst [ITER 10];` (graft dialect). */
  private def pageRankStmt: Parser[Stmt] =
    (ident <~ "=" <~ kw("pagerank")) ~ ident ~
      (kw("by") ~> ident) ~ ("," ~> ident) ~
      opt(kw("iter") ~> number) ^^ {
      case a ~ in ~ s ~ d ~ n =>
        PageRankStmt(a, in, s, d, n.map(_.toDouble.toInt).getOrElse(10)) }

  private def stmt: Parser[Stmt] =
    (load | store | dump | describe | filter | foreach | group | join |
     cross | union | distinctS | limit | orderBy | sample | split | rank |
     accumulate | intersection | difference | streamThrough | rscriptStmt | materialize | fsCmd |
     matchEvent | windowStmt | socketRead | socketWrite | rdfLoad | tuplify |
     bgpFilter | spatialFilter | spatialJoin | indexStmt | partitionStmt |
     zipStmt | cacheStmt | delayStmt | skylineStmt | visualizeStmt |
     dedupStmt | qualityStmt | tokenizeStmt | decontaminateStmt |
     packStmt | splitHashStmt | scoreStmt | profileStmt | heavyStmt |
     clusterStmt | temperatureStmt | topFracStmt | outliersStmt |
     diffStmt | pageRankStmt | ccStmt |
     asofJoinStmt | intervalJoinStmt | sessionizeStmt | quotaSampleStmt |
     mixtureStmt | overlapStmt | scheduleStmt |
     setCmd | register | defineAlias) <~ rep1(";")

  def script: Parser[Seq[Stmt]] = rep(stmt)

  /** Parse a full script; throws IllegalArgumentException with position
    * info on failure. */
  def parseScript(text: String): Seq[Stmt] =
    parseAll(script, text) match {
      case Success(stmts, _) => stmts
      case NoSuccess(msg, rest) =>
        throw new IllegalArgumentException(
          s"Pig parse error at line ${rest.pos.line}, col ${rest.pos.column}: $msg")
      case other =>
        throw new IllegalArgumentException(s"Pig parse error: $other")
    }
}
