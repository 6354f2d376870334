package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS local fingerprinting algorithm): hash every k-token gram,
  * slide a w-hash window, and keep the RIGHTMOST minimal hash of each
  * window. Guarantees: any substring match of at least w+k−1 tokens
  * between two documents shares at least one selected fingerprint, and
  * no match shorter than k tokens is ever detected — the standard way
  * to catch verbatim/boilerplate substring reuse that shingle-set
  * similarity (Jaccard/MinHash) dilutes away on long documents.
  *
  * Scale shape: fingerprint selection is ONE narrow codegen pass —
  * tokenize, k-gram hash array, window argmin, in-array dedup — with NO
  * shuffle at all (the whole doc is one row; every step is a
  * higher-order array function). Only the application that follows
  * (e.g. [[winnowPairs]]' inverted index) shuffles, and it shuffles
  * (id, pos, fp) longs, never text.
  *
  * Cross-engine determinism: hashes are the first 15 md5 hex digits (60
  * bits) of the 0x1F-joined gram, selection is pure integer argmin —
  * the DuckDB oracle replays the construction hash-exactly.
  */
object Winnow {

  /** (id, pos, fp): selected fingerprints per document; `pos` is the
    * 0-based token position of the winning k-gram. Docs with fewer than
    * k+w−1 tokens emit no rows (no complete window exists). */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
             k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1, s"winnow: k must be >= 1, got $k")
    require(w >= 1, s"winnow: w must be >= 1, got $w")
    require(!Seq("pos", "fp", "__toks", "__h", "__sel", "__s")
        .contains(idCol),
      s"winnow: id column '$idCol' collides with an output/internal name")
    val sep = "\u001F"
    // The tokens -> hash-array -> window-selection chain is written as
    // NESTED LAMBDA BINDINGS (transform over a one-element array +
    // element_at 1, a poor man's `let`): a plain withColumn chain gets
    // CollapseProject-inlined, and because higher-order functions
    // evaluate interpreted, every window would then rebuild the whole
    // hash array and every k-gram would re-tokenize the document --
    // O(tokens^2 * k) per doc, observed as a single task spinning for
    // minutes at sf0.1. A lambda variable is evaluated ONCE and cannot
    // be inlined through; the same binding wraps each window slice
    // (referenced three times).
    val sel =
      s"""element_at(transform(
            array(filter(split(__text, '\\\\s+'), x -> x <> '')),
            t -> element_at(transform(
              array(transform(sequence(0, size(t) - $k),
                p -> cast(conv(substring(md5(cast(
                       array_join(slice(t, p + 1, $k), '$sep')
                       as binary)), 1, 15), 16, 10) as bigint))),
              h -> array_distinct(
                transform(sequence(${w - 1}, size(h) - 1),
                  e -> element_at(transform(
                    array(slice(h, e - $w + 2, $w)),
                    win -> named_struct(
                      'pos', cast(e - $w
                        + ($w + 1 - array_position(reverse(win),
                                                   array_min(win)))
                        as bigint),
                      'fp', array_min(win))), 1)))), 1)), 1)"""
    // widen first (Dedup.hashedShingleDF rationale): the md5-per-gram
    // selection chain below is interpreted HOF work ~10x heavier than a
    // tokenize, and a single-row-group parquet scan would run ALL of it
    // on one task (measured: one 0.9 s CPU-bound task at sf0.1, warm)
    graft.dedup.Dedup.widen(docs)
      .select(col(idCol), lower(col(textCol)).as("__text"))
      .where(size(TextOps.tokens(col("__text"))) >= k + w - 1)
      .select(col(idCol), explode(expr(sel)).as("__s"))
      .select(col(idCol), col("__s.pos").as("pos"), col("__s.fp").as("fp"))
  }

  /** Candidate near-duplicate pairs by shared winnowed fingerprints:
    * (idA, idB, shared) with idA < idB and `shared` ≥ `minShared`
    * distinct fingerprints in common. The inverted index drops
    * fingerprints occurring in more than `maxDf` documents first (the
    * same df-cap idea as the Jaccard prefix filter): boilerplate grams
    * shared by half the corpus would otherwise square the join. */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 4, w: Int = 4, minShared: Int = 2,
                  maxDf: Int = 100): DataFrame = {
    require(minShared >= 1, s"winnowPairs: minShared >= 1, got $minShared")
    require(maxDf >= 2, s"winnowPairs: maxDf >= 2, got $maxDf")
    val fps = graft.core.Intermediates.track(
      winnow(docs, idCol, textCol, k, w)
        .select(col(idCol).as("__id"), col("fp")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf)
      .select("fp")
    val indexed = fps.join(rare, "fp")
    indexed.select(col("fp"), col("__id").as("id_a"))
      .join(indexed.select(col("fp"), col("__id").as("id_b")), "fp")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }
}
