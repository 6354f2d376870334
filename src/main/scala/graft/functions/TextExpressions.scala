package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass language ID (SURVEY §2 row 64).
  *
  * The Column formulation evaluated an interpreted `filter`/
  * `array_contains` lambda chain once PER LANGUAGE per row; this
  * expression makes a single compiled pass: one script scan for the CJK
  * branches, one tokenization, one hash-set probe per token. Semantics
  * are IDENTICAL to the Column version (and to the DuckDB oracle SQL):
  * script precedence zh > ja > ko, then stopword-profile argmax with
  * first-profile-wins ties, 'und' when no profile hits. */
case class LangIdExpr(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"

  @transient private lazy val sets: Array[(UTF8String, Set[String])] =
    profiles.map { case (l, ws) =>
      (UTF8String.fromString(l), ws.toSet)
    }.toArray
  @transient private lazy val zh = UTF8String.fromString("zh")
  @transient private lazy val ja = UTF8String.fromString("ja")
  @transient private lazy val ko = UTF8String.fromString("ko")
  @transient private lazy val und = UTF8String.fromString("und")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var hasHan = false; var hasKana = false; var hasHangul = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val sc = Character.UnicodeScript.of(cp)
      if (sc == Character.UnicodeScript.HAN) hasHan = true
      else if (sc == Character.UnicodeScript.HIRAGANA ||
               sc == Character.UnicodeScript.KATAKANA) hasKana = true
      else if (sc == Character.UnicodeScript.HANGUL) hasHangul = true
      i += Character.charCount(cp)
    }
    if (hasHan) return zh
    if (hasKana) return ja
    if (hasHangul) return ko
    val tokens = ShingleHash.tokenize(input.asInstanceOf[UTF8String])
    // lowercase once, not once per profile
    var t = 0
    while (t < tokens.length) {
      tokens(t) = tokens(t).toLowerCase(Locale.ROOT)
      t += 1
    }
    var bestLang: UTF8String = und
    var bestScore = 0
    var p = 0
    while (p < sets.length) {
      val (lang, set) = sets(p)
      var score = 0
      var j = 0
      while (j < tokens.length) {
        if (set.contains(tokens(j))) score += 1
        j += 1
      }
      if (score > bestScore) { bestScore = score; bestLang = lang }
      p += 1
    }
    bestLang
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** Unicode text canonicalization (pre-tokenization normalization — the
  * first pass of every training-data pipeline): Unicode normal form
  * (NFC/NFKC/NFD/NFKD), optional accent stripping (NFD → drop combining
  * marks → re-compose), optional ROOT-locale case fold. One compiled
  * per-row pass, no UDF registration/serialization. Apply order:
  * normalize → strip accents → case fold (the DuckDB oracle replays
  * `lower(strip_accents(nfc_normalize(x)))` in the same order). */
case class NormalizeTextExpr(child: Expression, form: String,
                             stripAccents: Boolean, caseFold: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  @transient private lazy val nf =
    java.text.Normalizer.Form.valueOf(form.toUpperCase(Locale.ROOT))

  override protected def nullSafeEval(input: Any): Any = {
    var s = java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, nf)
    if (stripAccents) {
      val nfd = java.text.Normalizer.normalize(
        s, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val cp = nfd.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      // re-normalize to the REQUESTED form (NFC/NFKC re-compose; NFD/NFKD
      // must stay decomposed — a hard-coded NFC would violate the form
      // the caller asked for)
      s = java.text.Normalizer.normalize(sb.toString, nf)
    }
    if (caseFold) s = s.toLowerCase(Locale.ROOT)
    UTF8String.fromString(s)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeTextExpr = copy(child = newChild)
}

object TextExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def langId(text: Column, profiles: Seq[(String, Seq[String])]): Column =
    column(LangIdExpr(expression(text), profiles))
  def normalizeText(text: Column, form: String = "NFC",
                    stripAccents: Boolean = false,
                    caseFold: Boolean = false): Column =
    column(NormalizeTextExpr(expression(text), form, stripAccents, caseFold))
}
