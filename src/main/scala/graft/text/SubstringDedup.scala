package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Exact repeated-substring excision (the substring-granular exact
  * dedup of Lee et al. 2021, "Deduplicating Training Data Makes
  * Language Models Better", arXiv:2107.06499 — re-expressed relationally):
  * any ≥k-token substring that occurs more than once ANYWHERE in the
  * corpus (across documents or within one) is removed from every
  * occurrence except the globally first, at token granularity. This is
  * the complement of the document-level strategies in
  * [[graft.dedup.Dedup]]: those drop whole near-duplicate documents;
  * this excises the verbatim boilerplate embedded INSIDE otherwise
  * unique documents, which document-level Jaccard dilutes away.
  *
  * Formulation: the suffix-array construction of the paper is replaced
  * by the equivalent k-gram-coverage rule — a token is removed iff it
  * is covered by some k-gram whose (doc, pos) occurrence is not the
  * global first occurrence of that gram. Every maximal duplicated run
  * of length L ≥ k is exactly the union of its L−k+1 duplicated
  * k-grams, so coverage removes precisely the duplicated runs (runs
  * shorter than k are below the match threshold by definition).
  *
  * Scale shape (the [[TextOps.dedupLines]] pattern at k-gram
  * granularity): one narrow pass builds each doc's k-gram hash array
  * (md5-60bit of the 0x1F-joined gram — the [[Winnow]] hash recipe);
  * the only shuffles are the gram-keyed partial aggregation (8-byte
  * keys), the duplicate-occurrence join and the per-doc reassembly,
  * whose collect_list is bounded by each document's own token count.
  * First-occurrence choice is min (doc, pos) — deterministic and
  * cross-engine replayable; the oracle joins gram STRINGS where the
  * engine joins 60-bit hashes (identical absent md5-collisions — the
  * [[Decontaminate]] precedent).
  */
object SubstringDedup {

  /** @return one row per input doc: (idCol, outCol, n_removed) —
    *         `outCol` = the document with every duplicated-substring
    *         occurrence (beyond each gram's global first) removed,
    *         tokens re-joined by single spaces; `n_removed` = tokens
    *         excised. Whitespace is not preserved (token-granular
    *         semantics, as in the reference tooling). */
  def exciseRepeated(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, outCol: String = "clean_text"): DataFrame = {
    require(k >= 2, s"exciseRepeated: k must be >= 2, got $k")
    require(!Seq("__toks", "__pos", "__tok", "__gh", "__cnt", "__first",
        "__cpos", "__cid", "__kept", "__n", outCol, "n_removed")
        .contains(idCol),
      s"exciseRepeated: id column '$idCol' collides with an internal name")
    // the Winnow gram separator: unambiguous for any text whose tokens
    // do not themselves contain 0x1F (true of natural text; the same
    // assumption Winnow documents)
    val sep = "\u001F"
    // tokens materialized ONCE as a projection attribute; three plan
    // branches (gram hashing, token table, original counts) read it —
    // persist so the tokenize scan runs once
    val toks = graft.core.Intermediates.track(
      graft.dedup.Dedup.widen(docs)
        .select(col(idCol),
          coalesce(TextOps.tokens(col(textCol)),
            typedLit(Seq.empty[String])).as("__toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // (id, pos, gh): every k-gram occurrence; docs shorter than k emit
    // none. slice/md5 read the __toks ATTRIBUTE, so nothing re-tokenizes
    val occ = toks.where(size(col("__toks")) >= k)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("__toks")) - k),
          p => conv(substring(md5(concat_ws(sep,
              slice(col("__toks"), p + 1, lit(k))).cast(BinaryType)),
            1, 15), 16, 10).cast(LongType))).as(Seq("__pos", "__gh")))

    // grams with ≥2 occurrences and their global first (min (id, pos) —
    // struct min is lexicographic)
    val firsts = occ.groupBy(col("__gh"))
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col(idCol), col("__pos"))).as("__first"))
      .where(col("__cnt") >= 2)
      .select(col("__gh"), col("__first"))

    // duplicate occurrences: everything but the first
    val dups = occ.join(firsts, Seq("__gh"))
      .where(col(idCol) =!= col("__first").getField(idCol) ||
        col("__pos") =!= col("__first").getField("__pos"))
      .select(col(idCol), col("__pos"))

    // covered token positions (k per duplicate occurrence, overlaps
    // deduped)
    val covered = dups.select(col(idCol).as("__cid"),
        explode(sequence(col("__pos"), col("__pos") + (k - 1))).as("__cpos"))
      .distinct()

    val tokTbl = toks.select(col(idCol),
      posexplode(col("__toks")).as(Seq("__pos", "__tok")))
    val kept = tokTbl.join(covered,
        tokTbl(idCol) === covered("__cid") &&
          col("__pos") === col("__cpos"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
          transform(sort_array(collect_list(struct(col("__pos"),
            col("__tok")))), x => x.getField("__tok"))).as(outCol),
        count(lit(1)).as("__kept"))

    toks.select(col(idCol), size(col("__toks")).cast(LongType).as("__n"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(outCol), lit("")).as(outCol),
        (col("__n") - coalesce(col("__kept"), lit(0L))).cast(LongType)
          .as("n_removed"))
  }
}
