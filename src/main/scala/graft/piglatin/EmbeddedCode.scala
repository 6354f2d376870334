package graft.piglatin

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.types._

/** Embedded Scala code blocks (reference: Language.md §Embedded Code —
  * `<% def f(...) = ... %>` inside a script defines functions usable in
  * FOREACH/FILTER expressions).
  *
  * piglet splices the code into its generated source; graft compiles the
  * block at runtime with the Scala toolbox. Serialization rule: toolbox
  * classes live in a driver-local classloader, so a compiled function
  * object can NEVER travel to executors (SerializedLambda resolution
  * fails). Instead the SOURCE travels: [[CompiledFn]] serializes only the
  * code string and lazily recompiles once per receiving JVM — the same
  * ship-source strategy the Spark REPL uses for ad-hoc classes.
  */
object EmbeddedCode {

  private[piglatin] lazy val toolbox = {
    import scala.tools.reflect.ToolBox
    scala.reflect.runtime.currentMirror.mkToolBox()
  }

  private val defRe =
    """def\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(([^)]*)\)\s*:\s*([A-Za-z_][A-Za-z0-9_\[\]\.]*)""".r
  private val blockRe = """(?s)<%(.*?)%>""".r

  /** One embedded function: everything needed to rebuild it anywhere. */
  final case class EmbeddedFn(name: String, code: String, arity: Int,
                              returnType: DataType)

  private def dataTypeOf(scalaType: String): DataType = scalaType match {
    case "Int" => IntegerType
    case "Long" => LongType
    case "Float" => FloatType
    case "Double" => DoubleType
    case "String" => StringType
    case "Boolean" => BooleanType
    case other => sys.error(
      s"embedded functions must return Int/Long/Float/Double/String/Boolean, got $other")
  }

  /** Parse a code block's defs (name, arity, declared return type). The
    * explicit return-type annotation is required — it becomes the UDF's
    * Catalyst DataType. */
  def compile(code: String): Map[String, EmbeddedFn] =
    defRe.findAllMatchIn(code).map { m =>
      val name = m.group(1)
      val arity =
        if (m.group(2).trim.isEmpty) 0 else m.group(2).count(_ == ':')
      name.toUpperCase -> EmbeddedFn(name, code, arity, dataTypeOf(m.group(3)))
    }.toMap

  /** Strip blocks without compiling (parse-compatibility sweeps). */
  def blockStrip(script: String): (String, Unit) =
    (blockRe.replaceAllIn(script, ""), ())

  def extract(script: String): (String, Map[String, EmbeddedFn]) = {
    val fns = blockRe.findAllMatchIn(script)
      .flatMap(m => compile(m.group(1))).toMap
    (blockRe.replaceAllIn(script, ""), fns)
  }

  /** Build the Column applying an embedded fn to argument columns: a
    * ScalaUDF over a source-shipping closure (legacy converter path — no
    * encoders — so primitive/String args round-trip via
    * CatalystTypeConverters). */
  def asColumn(fn: EmbeddedFn, args: Seq[Column]): Column = {
    require(args.length == fn.arity,
      s"${fn.name} expects ${fn.arity} args, got ${args.length}")
    GraftColumnBridge.column(ScalaUDF(
      CompiledFn.forArity(fn), fn.returnType,
      args.map(GraftColumnBridge.expression),
      inputEncoders = args.map(_ => None),
      udfName = Some(fn.name)))
  }
}

/** Source-shipping function wrappers: serialize (code, name), recompile
  * lazily in whichever JVM applies them. The compiled instance is cached
  * per (code, name) per JVM. */
object CompiledFn {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), AnyRef]()

  private[piglatin] def resolve(code: String, name: String): AnyRef =
    cache.computeIfAbsent((code, name), { _ =>
      // ToolBox is not thread-safe and computeIfAbsent only locks
      // per-KEY: two tasks resolving DIFFERENT functions would otherwise
      // run parse/eval concurrently on the shared toolbox and crash the
      // compiler nondeterministically
      EmbeddedCode.toolbox.synchronized {
        EmbeddedCode.toolbox.eval(EmbeddedCode.toolbox.parse(
          s"$code\n$name _")).asInstanceOf[AnyRef]
      }
    })

  def forArity(fn: EmbeddedCode.EmbeddedFn): AnyRef = fn.arity match {
    case 0 => new F0(fn.code, fn.name)
    case 1 => new F1(fn.code, fn.name)
    case 2 => new F2(fn.code, fn.name)
    case 3 => new F3(fn.code, fn.name)
    case 4 => new F4(fn.code, fn.name)
    case n => sys.error(s"embedded functions support up to 4 args, got $n")
  }

  final class F0(code: String, name: String)
      extends (() => Any) with Serializable {
    @transient private lazy val f = resolve(code, name).asInstanceOf[() => Any]
    def apply(): Any = f()
  }
  final class F1(code: String, name: String)
      extends (Any => Any) with Serializable {
    @transient private lazy val f = resolve(code, name).asInstanceOf[Any => Any]
    def apply(a: Any): Any = f(a)
  }
  final class F2(code: String, name: String)
      extends ((Any, Any) => Any) with Serializable {
    @transient private lazy val f =
      resolve(code, name).asInstanceOf[(Any, Any) => Any]
    def apply(a: Any, b: Any): Any = f(a, b)
  }
  final class F3(code: String, name: String)
      extends ((Any, Any, Any) => Any) with Serializable {
    @transient private lazy val f =
      resolve(code, name).asInstanceOf[(Any, Any, Any) => Any]
    def apply(a: Any, b: Any, c: Any): Any = f(a, b, c)
  }
  final class F4(code: String, name: String)
      extends ((Any, Any, Any, Any) => Any) with Serializable {
    @transient private lazy val f =
      resolve(code, name).asInstanceOf[(Any, Any, Any, Any) => Any]
    def apply(a: Any, b: Any, c: Any, d: Any): Any = f(a, b, c, d)
  }
}
