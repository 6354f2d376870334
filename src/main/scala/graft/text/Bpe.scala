package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016): the merge table
  * is trained DRIVER-SIDE on a bounded seeded document sample (the same
  * train-on-sample regime as the IVF/PQ quantizers — production
  * tokenizers are trained on a corpus sample too, then applied
  * everywhere), and ENCODE runs at corpus scale as a native expression
  * ([[graft.functions.BpeExpressions]]): one compiled per-row pass, no
  * interpreted lambda dispatch, no shuffle.
  *
  * Exact token counts under the LEARNED vocabulary are what a training
  * pipeline actually needs (packing offsets, length filters, cost
  * estimates) — the `bpeTokens` regex in [[TextOps]] is only the
  * pre-tokenizer approximation.
  *
  * Semantics (classic): a word is its codepoints plus a terminal
  * `</w>`; training repeatedly merges the most frequent adjacent pair
  * (ties: lexicographically smallest pair — deterministic, where the
  * original is arbitrary); encode applies learned merges by repeatedly
  * merging the lowest-rank pair present. Merging the leftmost
  * occurrence and rescanning is equivalent to merging all occurrences
  * of the chosen pair at once, because a pair created by a merge can
  * only involve the merged symbol, whose own merges were learned LATER
  * (higher rank) — so the chosen pair stays the lowest-rank pair until
  * exhausted. The oracle replays the single-merge form; the engine
  * runs the all-at-once form.
  *
  * Whitespace-class caveat: words are split with Java's `\s+` while the
  * DuckDB oracle splits with RE2's `\s+`; the two classes agree on
  * space/tab/newline/CR/FF but differ on `\x0B` (vertical tab) and some
  * Unicode spaces. Cross-engine exactness therefore assumes input whose
  * whitespace is limited to the common subset (true of the test corpus;
  * normalize exotic whitespace to spaces first if that cannot be
  * guaranteed).
  */
object Bpe {

  /** Ordered merge table from a seeded sample of `docs`. Words are
    * whitespace tokens; frequencies weight the pair counts. */
  def train(docs: DataFrame, textCol: String, numMerges: Int = 200,
            sampleSize: Int = 2048, seed: Long = 42L): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val texts = sampleTexts(docs, textCol, sampleSize, seed)
    val wordFreq = new scala.collection.mutable.HashMap[String, Long]()
    texts.foreach(_.split("\\s+").foreach { w =>
      if (w.nonEmpty) wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1L
    })
    // dict: word symbol sequences (codepoints + terminal marker)
    var dict: Seq[(Array[String], Long)] = wordFreq.toSeq.sortBy(_._1)
      .map { case (w, f) => (splitWord(w), f) }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var m = 0
    while (m < numMerges && !done) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      dict.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max frequency; ties to the lexicographically smallest pair
        val best = counts.toSeq.minBy { case ((a, b), f) => (-f, a, b) }._1
        merges += best
        dict = dict.map { case (syms, f) => (mergeAll(syms, best), f) }
        m += 1
      }
    }
    merges.result()
  }

  /** Codepoint symbols + terminal marker (surrogate-pair safe — chars
    * would shred astral-plane codepoints; the oracle's RE2 `.` matches
    * whole runes). */
  private[graft] def splitWord(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += "</w>"
    out.result()
  }

  /** One left-to-right pass merging all non-overlapping occurrences. */
  private[graft] def mergeAll(syms: Array[String],
                              p: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Bounded seeded sample of text values (the
    * [[graft.sim.Similarity.seededSampleVecs]] recipe for strings):
    * one corpus pass — the sampleSize smallest seed-salted hashes via
    * TakeOrderedAndProject. Hash order is pseudorandom w.r.t. content,
    * so this is a uniform seeded sample without the extra count() scan
    * a Bernoulli fraction would need to size itself. */
  private def sampleTexts(docs: DataFrame, textCol: String,
                          sampleSize: Int, seed: Long): Array[String] = {
    docs.select(col(textCol).cast("string").as("t"))
      .where(col("t").isNotNull)
      .sort(xxhash64(lit(seed), col("t")))
      .limit(sampleSize).collect().map(_.getString(0))
  }

  /** array<string> of learned-BPE tokens of a whitespace-tokenized text
    * column — one native compiled pass per row. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.BpeExpressions.encode(text, merges)

  /** Exact token count under the learned vocabulary. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges)).cast("long")

  /** Inverse of [[encode]]: every token stream concatenates back to the
    * original words because merges only ever concatenate adjacent
    * symbols — the `</w>` terminal marker (one per input word, possibly
    * merged into its last token) maps back to the single-space join.
    * `decode(encode(t))` therefore equals t's whitespace-normalized form
    * exactly — the detokenize guarantee a training pipeline needs before
    * it can round-trip corpora through token space. Precondition: the
    * text itself does not contain the literal marker (no natural corpus
    * does; encode would conflate it with a word boundary anyway). */
  def decode(tokens: Column): Column =
    rtrim(replace(array_join(tokens, ""), lit("</w>"), lit(" ")))

  /** Deterministic token→id table: id 0 is reserved for `<unk>`
    * (char-level BPE has OOV at apply time — any codepoint absent from
    * the training sample; byte-level BPE would close that hole at the
    * cost of non-textual tokens), then base symbols in sorted order,
    * then merge products in merge order. Built from the training
    * sample's alphabet ∪ merge products, so train + vocab always agree. */
  def vocab(docs: DataFrame, textCol: String,
            merges: Seq[(String, String)], sampleSize: Int = 2048,
            seed: Long = 42L): Map[String, Int] = {
    val alphabet = scala.collection.mutable.SortedSet.empty[String]
    sampleTexts(docs, textCol, sampleSize, seed)
      .foreach(_.split("\\s+").foreach { w =>
        if (w.nonEmpty) splitWord(w).foreach(alphabet += _)
      })
    val products = merges.map { case (a, b) => a + b }
    ((alphabet.toSeq ++ products.filterNot(alphabet)).distinct
      .zipWithIndex.map { case (s, i) => (s, i + 1) }).toMap
  }

  /** array<int> of token ids (`<unk>` = 0 for out-of-vocabulary
    * symbols) — the column a training pipeline actually materializes. */
  def encodeIds(text: Column, merges: Seq[(String, String)],
                vocab: Map[String, Int]): Column = {
    // literal lookup via map_from_arrays(keys, ids); element_at yields
    // null for misses → coalesce to the <unk> id
    val keys = vocab.keys.toSeq.sorted
    val keyCol = lit(keys.toArray)
    val idCol = lit(keys.map(vocab).toArray)
    transform(encode(text, merges), t =>
      coalesce(element_at(map_from_arrays(keyCol, idCol), t), lit(0)))
  }
}
