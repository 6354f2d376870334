package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import graft.piglatin.{EmbeddedCode, PigParser, PigScript}

/** Front-end compatibility: every Pig script in the reference's
  * integration suite must parse (after the same pre-passes a real run
  * applies: param substitution, IMPORT inlining, macro expansion,
  * embedded-block extraction). */
class ParseCompatSpec extends AnyFunSuite {

  test("all reference integration scripts parse") {
    val dir = Paths.get("/root/reference/src/it/resources")
    assume(Files.isDirectory(dir))
    val pigs = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".pig")).toSeq.sortBy(_.toString)
    val failures = pigs.flatMap { p =>
      val sub = Files.readString(p)
        .replaceAll("\\$[A-Za-z_][A-Za-z0-9_]*", "X")
      try {
        val imported = PigScript.expandImports(sub, Some("/root/reference"))
        val expanded = PigScript.expandMacros(imported)
        val (cleaned, _) = EmbeddedCode.blockStrip(expanded)
        PigParser.parseScript(cleaned)
        None
      } catch {
        case e: Throwable => Some(s"${p.getFileName}: ${e.getMessage.take(80)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    assert(pigs.size == 61) // guard against an empty directory passing
  }
}
