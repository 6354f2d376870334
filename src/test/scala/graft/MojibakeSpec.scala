package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def fix(s: String): String =
    Seq(s).toDF("t").select(TextOps.fixMojibake(col("t")).as("v"))
      .head().getString(0)

  test("repairs the canonical damage: accents, punctuation, symbols") {
    // the damage strings ARE utf8-bytes-read-as-latin1: build them from
    // the intended text so the table provably inverts real mojibake
    def damage(clean: String): String =
      new String(clean.getBytes("UTF-8"),
        java.nio.charset.StandardCharsets.ISO_8859_1)
    val cleans = Seq("Café", "naïve", "Müller", "señor", "ça", "él",
      "straße", "25°", "«x»")
    cleans.foreach { c => assert(fix(damage(c)) == c, c) }
  }

  test("cp1252 smart punctuation repairs via the â€ family") {
    // cp1252 mojibake (€ at 0x80, not latin1 control): em dash, quotes,
    // ellipsis
    def damage1252(clean: String): String =
      new String(clean.getBytes("UTF-8"), "windows-1252")
    Seq("—", "–", "’", "‘", "“", "…").foreach { c =>
      assert(fix(damage1252(c)) == c, c.codePointAt(0).toString)
    }
  }

  test("clean text and unmapped sequences pass through untouched") {
    val clean = "plain ascii, already-fixed é ü ß — and “quotes”"
    assert(fix(clean) == clean)
    // Ã£ (ã damage) has no table entry — must NOT be half-rewritten
    assert(fix("maÃ§Ã£") == "maçÃ£")
  }

  test("idempotent: fixing twice equals fixing once") {
    val damaged = "CafÃ© â€” â€œnaÃ¯veâ€¦ 25Â° straÃe"
    assert(fix(fix(damaged)) == fix(damaged))
  }
}
