package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for large-scale corpus pipelines (SURVEY.md §2
  * rows 64–67). All pure `Column` compositions — they stay inside
  * whole-stage codegen, no UDF/closure serialization, and scale linearly
  * with no shuffle (per-row narrow transforms).
  */
object TextOps {

  /** Whitespace tokens, empties dropped (leading/trailing-space safe). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** BPE-ish sub-word tokens: word pieces + isolated punctuation, the
    * pre-tokenization regex most BPE vocabularies assume. Unicode
    * letter/number classes — ASCII-only [A-Za-z] would shred accented
    * and non-Latin words into per-character pseudo-punctuation tokens
    * (RE2 and Java agree on \p{L}/\p{N}, so the oracle replays it). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("""\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"""), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast(LongType)

  /** English stopwords — exposed so oracle SQL builds from the SAME list
    * the engine computes with (silent drift would break the q_quality
    * hash compare). */
  def enStopwords: Seq[String] = stopwords.head._2

  /** All language stopword profiles in argmax precedence order — exposed
    * so the langId oracle SQL is built from the SAME lists the engine
    * scores with (silent drift would break the hash compare). */
  def stopwordProfiles: Seq[(String, Seq[String])] = stopwords

  // --- language ID (n-gram/stopword heuristic) -----------------------------
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
      "on", "with", "as", "at", "by", "this", "have", "from", "or", "not"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
      "auf", "für", "von", "dem", "den", "des", "im", "sich", "auch", "als", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "du", "dans",
      "pour", "que", "qui", "avec", "sur", "pas", "au", "ce", "il", "ne"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "en",
      "que", "por", "con", "para", "no", "se", "su", "al", "lo", "como"))

  /** Heuristic language ID: CJK script detection, else stopword-profile
    * argmax (deterministic tie-break by profile order, 'und' if no hits).
    * A real system would use char-trigram profiles; the shape (per-row
    * narrow map) is the same. Compiled as a single-pass native
    * Expression — the Column formulation re-ran an interpreted
    * filter/array_contains lambda chain once per language per row. */
  def langId(text: Column): Column =
    graft.functions.TextExpressions.langId(text, stopwords)

  // --- quality scoring ------------------------------------------------------
  def punctCount(text: Column): Column =
    length(regexp_replace(text, """[^\.\!\?\,\;\:]""", ""))

  /** Ratio of tokens that are common-English stopwords (model-quality
    * heuristic: natural prose has ~0.3–0.6; keyword spam has ~0). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val en = stopwords.head._2
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => array_contains(lit(en.toArray), lower(t))))
        .cast(DoubleType) / size(toks).cast(DoubleType))
  }

  def meanTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "\\s+", "")).cast(DoubleType) / n.cast(DoubleType))
  }

  /** Composite document-quality score in [0,1]: stopword naturalness +
    * plausible word lengths + low punctuation density. Deterministic; the
    * identical formula is expressible in ANSI SQL for the oracle, and the
    * raw double is kept un-rounded — identical IEEE op order on both sides
    * yields bit-equal values, whereas engine `round()` implementations
    * disagree at half boundaries. */
  def qualityScore(text: Column): Column = {
    val punctRatio = when(length(text) === 0, lit(0.0))
      .otherwise(punctCount(text).cast(DoubleType) / length(text).cast(DoubleType))
    stopwordRatio(text) * 0.4 +
      least(meanTokenLen(text) / 10.0, lit(1.0)) * 0.3 +
      (lit(1.0) - punctRatio) * 0.3
  }

  // --- Gopher rule filter ---------------------------------------------------
  /** The Gopher rule stop-word set (Rae et al. 2021, Appendix A1.1) —
    * exposed so the oracle SQL builds from the SAME list. */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style rule-based quality filter (Rae et al. 2021, Appendix
    * A1.1 — the rule set RefinedWeb/FineWeb-class pipelines still apply
    * before any model-based filtering). Returns a struct of the per-rule
    * measurements plus the conjunction `keep`:
    *
    *  - n_words ∈ [minWords, maxWords] (paper: 50–100 000)
    *  - mean_word_len ∈ [3, 10]
    *  - symbol_ratio ≤ 0.1 — '#', '…' or '...' occurrences per word
    *  - bullet_frac ≤ 0.9 — non-blank lines starting with -, * or •
    *  - ellipsis_frac ≤ 0.3 — non-blank lines ending with … or '...'
    *  - alpha_frac ≥ 0.8 — words containing at least one letter
    *  - stop_hits ≥ 2 — DISTINCT [[gopherStops]] words present
    *
    * One narrow codegen pass (ratios are single integer divides, so a
    * SQL oracle replays every double bit-exactly); empty docs measure 0
    * everywhere and fail `keep` on the word-count rule. */
  def gopherRules(text: Column, minWords: Long = 50L,
                  maxWords: Long = 100000L): Column = {
    val toks = tokens(text)
    val n = size(toks).cast(LongType)
    val nD = n.cast(DoubleType)
    val meanLen = when(n === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast(LongType))
        .cast(DoubleType) / nD)
    val symbols = (regexp_count(text, lit("#")) +
      regexp_count(text, lit("…")) +
      regexp_count(text, lit("\\.\\.\\."))).cast(LongType)
    val symbolRatio = when(n === 0, lit(0.0))
      .otherwise(symbols.cast(DoubleType) / nD)
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines).cast(LongType)
    val bulletFrac = when(nLines === 0, lit(0.0)).otherwise(
      size(filter(lines, l =>
          substring(trim(l), 1, 1).isin("-", "*", "•")))
        .cast(DoubleType) / nLines.cast(DoubleType))
    val ellipsisFrac = when(nLines === 0, lit(0.0)).otherwise(
      size(filter(lines, l =>
          endswith(trim(l), lit("…")) || endswith(trim(l), lit("..."))))
        .cast(DoubleType) / nLines.cast(DoubleType))
    val alphaFrac = when(n === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.rlike("\\p{L}")))
        .cast(DoubleType) / nD)
    val stopHits = size(array_intersect(
      array_distinct(transform(toks, t => lower(t))),
      lit(gopherStops.toArray))).cast(LongType)
    val keep = n >= minWords && n <= maxWords &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symbolRatio <= 0.1 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 && stopHits >= 2L
    struct(n.as("n_words"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      stopHits.as("stop_hits"), keep.as("keep"))
  }

  // --- PII scrubbing --------------------------------------------------------
  /** PII patterns shared with the oracle SQL (q_pii_scrub): simple
    * RE2-and-Java-compatible regexes (no lookaround/backrefs) so Spark
    * and DuckDB replace identically. Order matters — emails first (their
    * local parts may contain digit runs), then phone, then SSN-style ids. */
  val piiPatterns: Seq[(String, String)] = Seq(
    """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""" -> "<EMAIL>",
    """\b\d{3}[-. ]\d{3}[-. ]\d{4}\b""" -> "<PHONE>",
    """\b\d{3}-\d{2}-\d{4}\b""" -> "<ID>")

  /** Redact emails / phone numbers / SSN-style ids — the pre-training
    * scrub pass. Pure codegen'd regexp_replace chain: narrow, no shuffle,
    * linear scan at any scale. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  // --- sentence statistics ----------------------------------------------------
  /** Heuristic sentence segmentation: maximal runs of non-terminators
    * plus their trailing `.!?` cluster, trimmed, empties dropped. The
    * pattern deliberately avoids lookbehind (RE2 — and therefore the
    * cross-engine oracle — has none). */
  def sentences(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit("[^.!?]+[.!?]*"), lit(0)),
        s => trim(s)),
      s => s =!= "")

  /** Per-document sentence count — with [[sentences]] mean length this
    * is the classic "degenerate prose" gate (one-sentence walls of
    * text, telegraphic fragment spam). */
  def sentenceCount(text: Column): Column = size(sentences(text))

  /** Mean sentence length in characters (0.0 for sentence-free docs). */
  def meanSentenceChars(text: Column): Column = {
    val s = sentences(text)
    aggregate(transform(s, x => length(x)), lit(0), (a, x) => a + x)
      .cast("double") / greatest(size(s), lit(1)).cast("double")
  }

  // --- script detection ------------------------------------------------------
  /** The Unicode scripts profiled, in DOMINANCE-TIE priority order.
    * Java spells the property `\p{IsLatin}`, RE2/DuckDB `\p{Latin}` —
    * same Script property, so counts agree cross-engine. */
  private[graft] val scriptNames: Seq[String] =
    Seq("Latin", "Cyrillic", "Greek", "Han", "Arabic", "Hebrew", "Hangul")

  /** Per-script character count: chars OUTSIDE the script stripped,
    * length of what remains. One codegen'd regexp pass per script. */
  def scriptChars(text: Column, script: String): Column = {
    require(scriptNames.contains(script), s"unknown script: $script")
    length(regexp_replace(text, s"[^\\p{Is$script}]", ""))
  }

  /** Dominant script by count — a fixed `when` chain in `scriptNames`
    * order, so ties resolve deterministically (and identically in the
    * SQL replay's CASE chain). "none" when no profiled script appears. */
  def dominantScript(text: Column): Column = {
    val counts = scriptNames.map(s => s -> scriptChars(text, s))
    val maxAll = greatest(counts.map(_._2): _*)
    counts.foldRight(lit("none")) { case ((name, c), tail) =>
      when(c > 0 && c === maxAll, lit(name.toLowerCase)).otherwise(tail)
    }
  }

  // --- mojibake repair -------------------------------------------------------
  /** The common UTF-8-bytes-decoded-as-Latin-1/cp1252 damage patterns →
    * their intended characters (the ftfy-style core table). Longest
    * sequences sit first so the 3-char `â€x` family never loses its
    * prefix to a 2-char rule. `private[graft]` so the DuckDB oracle
    * folds the IDENTICAL literal replaces. */
  private[graft] val mojibakeTable: Seq[(String, String)] = Seq(
    "â€”" -> "—", // â€” → em dash
    "â€“" -> "–", // â€“ → en dash
    "â€™" -> "’", // â€™ → right single quote
    "â€˜" -> "‘", // â€˜ → left single quote
    "â€œ" -> "“", // â€œ → left double quote
    "â€¦" -> "…", // â€¦ → ellipsis
    "Ã©" -> "é", // Ã© → é
    "Ã¨" -> "è", // Ã¨ → è
    "Ã¯" -> "ï", // Ã¯ → ï
    "Ã¼" -> "ü", // Ã¼ → ü
    "Ã¶" -> "ö", // Ã¶ → ö
    "Ã¤" -> "ä", // Ã¤ → ä
    "Ã±" -> "ñ", // Ã± → ñ
    "Ã§" -> "ç", // Ã§ → ç
    "Ã¡" -> "á", // Ã¡ → á
    "Ã³" -> "ó", // Ã³ → ó
    "Ãº" -> "ú", // Ãº → ú
    "Ã" -> "ß", // Ã + control → ß
    "Â " -> " ",      // Â+nbsp → plain space
    "Â°" -> "°", // Â° → °
    "Â·" -> "·", // Â· → ·
    "Â«" -> "«", // Â« → «
    "Â»" -> "»") // Â» → »

  /** Repair UTF-8-read-as-Latin-1 mojibake (the single most common
    * encoding damage in web crawls) by literal table substitution —
    * a pure `replace` fold: codegen'd, cross-engine replayable, and a
    * no-op on clean text. Not a general transcoder (ftfy's full model
    * needs chained-encoding inference); the table covers the dominant
    * Western-European + smart-punctuation cases. */
  def fixMojibake(text: Column): Column =
    mojibakeTable.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }

  // --- repetition / boilerplate detection -----------------------------------
  /** DEFLATE compression ratio (compressed bytes / raw bytes, raw ≥ 1):
    * templated or repetitive text scores low, prose lands mid-range,
    * high-entropy noise near (or above) 1. The cheap GLOBAL-redundancy
    * complement of [[repetitionRatio]]'s windowed n-gram counts — zlib
    * sees repeats anywhere in its window, not just adjacent n-grams.
    * Rows-only at the gate (no cross-engine zlib); contracts spec'd
    * relatively + against a direct Deflater model (CompressionSpec). */
  def compressionRatio(text: Column, level: Int = 6): Column =
    graft.functions.DeflateLength(text, level).cast("double") /
      greatest(octet_length(text), lit(1)).cast("double")

  /** Fraction of repeated word n-grams in the document: 1 − distinct/total
    * (0 for docs shorter than n tokens). High values flag boilerplate,
    * keyword stuffing and degenerate generations — a standard
    * training-data quality gate. Narrow per-row transform. */
  def repetitionRatio(text: Column, n: Int = 1): Column = {
    val toks = tokens(text)
    // n-grams as an O(tokens) zip of n shifted views — a transform over
    // per-index slice() calls would be O(tokens²) per document
    val grams =
      if (n <= 1) toks
      else {
        val m = greatest(size(toks) - (n - 1), lit(0)) // gram count
        (1 until n).foldLeft(slice(toks, lit(1), m))((acc, j) =>
          zip_with(acc, slice(toks, lit(1 + j), m),
            (a, b) => concat(a, lit(" "), b)))
      }
    when(size(grams) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(grams)).cast(DoubleType)
        / size(grams).cast(DoubleType))
  }

  // --- Unicode canonicalization ---------------------------------------------
  /** Unicode-canonicalize text: normal form + optional accent strip +
    * optional ROOT-locale case fold. The standard pre-tokenization pass;
    * a single compiled per-row scan (native Expression, no UDF). */
  def normalizeText(text: Column, form: String = "NFC",
                    stripAccents: Boolean = false,
                    caseFold: Boolean = false): Column =
    graft.functions.TextExpressions.normalizeText(
      text, form, stripAccents, caseFold)

  // --- fingerprinting -------------------------------------------------------
  /** Canonical content fingerprint: md5 of whitespace-normalized text. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Winnowing-style rolling fingerprint: min hash over word w-grams —
    * robust to local edits, one 64-bit value per doc, no shuffle. */
  def rollingFingerprint(text: Column, w: Int = 5): Column = {
    val toks = tokens(text)
    val grams = when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
    array_min(transform(grams, g => xxhash64(g)))
  }

  /** Cross-corpus duplicate-LINE removal (the C4-style cleanup: drop any
    * line occurring in more than `maxDf` distinct documents — navigation
    * chrome, cookie banners, boilerplate headers — and reassemble each
    * document from its surviving lines in order).
    *
    * Scale shape: posexplode -> line-hash groupBy with map-side partial
    * aggregation (the shuffle carries (md5, id) pairs, never line text
    * twice), the common-line set is normally tiny and AQE broadcasts the
    * anti-join, and reassembly is a per-document groupBy whose
    * collect_list is bounded by the document's own size. Documents whose
    * every line is boilerplate drop out of the result (their cleaned
    * text would be empty).
    *
    * Returns (idCol, `outCol`): the reassembled text. */
  def dedupLines(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, maxDf: Int, delim: String = "\n",
                 outCol: String = "clean_text")
      : org.apache.spark.sql.DataFrame = {
    require(maxDf >= 1, s"dedupLines: maxDf must be >= 1, got $maxDf")
    require(!Seq("__pos", "__line", "__lh", "__df", outCol).contains(idCol),
      s"dedupLines: id column '$idCol' collides with an internal name")
    // widen: the split+posexplode+md5 stage is CPU-heavy, and a
    // single-row-group parquet input would run it on one task
    val lines = graft.dedup.Dedup.widen(docs).select(col(idCol),
      posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(delim))).as(Seq("__pos", "__line")))
    val hashed = lines.withColumn("__lh",
      md5(col("__line").cast(BinaryType)))
    val common = hashed.groupBy("__lh")
      .agg(countDistinct(col(idCol)).as("__df"))
      .where(col("__df") > maxDf)
      .select("__lh")
    hashed.join(common, Seq("__lh"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(delim,
        transform(sort_array(collect_list(struct(col("__pos"),
          col("__line")))), x => x.getField("__line"))).as(outCol))
  }
}
