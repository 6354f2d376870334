package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  * (per-token xxhash64 combined by a structural slice hash);
  * the only shuffles are the gram-keyed partial aggregation (8-byte
  * keys), the duplicate-occurrence join, and ONE id-keyed exchange that
  * serves the gaps-and-islands interval merge (window + both island
  * aggregations reuse the same partitioning). Duplicate spans travel as
  * merged (start,end) intervals — d rows, not k·d covered positions —
  * and excision is an array-side walk over each doc's own token array,
  * so no per-position join or token-table explosion ever forms.
  * First-occurrence choice is min (doc, pos) — deterministic and
  * cross-engine replayable; the oracle joins gram STRINGS where the
  * engine joins 64-bit hashes (identical absent xxhash64 collisions — the
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
    require(!Seq("__toks", "__th", "__pos", "__gh", "__cnt", "__first",
        "__new", "__isl", "__s", "__e", "__ivs", "__kept", outCol, "n_removed")
        .contains(idCol),
      s"exciseRepeated: id column '$idCol' collides with an internal name")
    // can (id, pos) pack into one long? Integral ids up to 2^41 with
    // docs under 2^21 tokens (~8 MB of text — far beyond any curated
    // document) pack as id·2^21 + pos, which ORDERS EXACTLY like the
    // lexicographic (id, pos) struct but aggregates through the fast
    // HashAggregate min(long) instead of a SortAggregate min(struct)
    // (struct min is sort-based: it forced two extra 26M-row sorts at
    // the 100× profile). Non-integral ids keep the struct path.
    val packable = docs.schema.find(_.name == idCol)
      .map(_.dataType).exists {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => true
        case _ => false
      }
    val PosBits = 21
    // tokens materialized ONCE as a projection attribute; three plan
    // branches (gram hashing, token table, original counts) read it —
    // persist so the tokenize scan runs once. The packed path checks
    // its bounds per DOC (not per gram): blown bounds raise, never
    // silently misorder
    val rawToks = coalesce(TextOps.tokens(col(textCol)),
      typedLit(Seq.empty[String]))
    val guardedToks =
      if (!packable) rawToks
      else when(size(rawToks) < (1 << PosBits) &&
          abs(col(idCol).cast(LongType)) < (1L << 41), rawToks)
        .otherwise(raise_error(concat(
          lit("exciseRepeated: doc "), col(idCol).cast("string"),
          lit(s" exceeds the packed-first bounds (tokens < 2^$PosBits, |id| < 2^41)"))))
    val toks = graft.core.Intermediates.track(
      graft.dedup.Dedup.widen(docs)
        .select(col(idCol), guardedToks.as("__toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // (id, pos, gh): every k-gram occurrence; docs shorter than k emit
    // none. Two-level hashing: each token hashes ONCE into a long
    // (__th), then a gram hashes the k-long slice — so token bytes are
    // not re-hashed by every one of the k overlapping grams, and no
    // per-gram string is ever allocated (the previous
    // concat_ws→md5→hex→conv chain was the hottest compute at the 100×
    // profile). Array hashing seeds element-by-element, so token
    // BOUNDARIES are part of the hash — no join-separator aliasing by
    // construction. The ORACLE joins gram STRINGS; the engine's hash
    // only has to be collision-free (64-bit — the Decontaminate
    // precedent), not replayable.
    val occ = graft.core.Intermediates.track(
      toks.where(size(col("__toks")) >= k)
        .select(col(idCol),
          transform(col("__toks"), t => xxhash64(t)).as("__th"))
        .select(col(idCol), posexplode(
          transform(sequence(lit(0), size(col("__th")) - k),
            p => xxhash64(slice(col("__th"), p + 1, lit(k)))))
          .as(Seq("__pos", "__gh")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // each occurrence's global-first ranking key: min over it is the
    // lexicographic (id, pos) minimum on both paths
    val firstExpr =
      if (packable) col(idCol).cast(LongType) * (1L << PosBits) + col("__pos")
      else struct(col(idCol), col("__pos"))

    // grams with ≥2 occurrences and their global first occurrence
    val firsts = occ.groupBy(col("__gh"))
      .agg(count(lit(1)).as("__cnt"), min(firstExpr).as("__first"))
      .where(col("__cnt") >= 2)
      .select(col("__gh"), col("__first"))

    // duplicate occurrences: everything but the first
    val dups = occ.join(firsts, Seq("__gh"))
      .where(firstExpr =!= col("__first"))
      .select(col(idCol), col("__pos"))

    // merge each duplicate occurrence's covered span [pos, pos+k-1] into
    // maximal disjoint islands per doc (gaps-and-islands over the d
    // duplicate rows). This replaces the naive explode-every-covered-
    // position + distinct + full-token-table anti-join, which emitted
    // k rows per duplicate occurrence AND posexploded every token of
    // every doc — the k× blowup behind the old 17.6× 100×-scale ratio.
    // One shuffle on idCol serves the window, the island aggregation
    // (grouping keys ⊇ partition key) and the per-doc interval list.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__pos"))
    val prevEnd = max(col("__pos") + (k - 1))
      .over(w.rowsBetween(Long.MinValue, -1))
    val ivs = dups
      .select(col(idCol), col("__pos"),
        when(prevEnd.isNull || col("__pos") > prevEnd + 1, 1)
          .otherwise(0).as("__new"))
      .withColumn("__isl", sum(col("__new")).over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("__pos")).as("__s"),
        (max(col("__pos")) + (k - 1)).as("__e"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__s"), col("__e"))))
        .as("__ivs"))

    // array-side excision: walk the (sorted, disjoint) intervals once,
    // concatenating the kept slices between them — O(tokens) per doc,
    // no token-table explosion, no per-position join
    val n = size(col("__toks"))
    def walk = aggregate(
      col("__ivs"),
      struct(lit(0).as("c"), typedLit(Seq.empty[String]).as("p")),
      (acc, iv) => struct(
        (iv.getField("__e") + 1).as("c"),
        concat(acc.getField("p"),
          slice(col("__toks"), acc.getField("c") + 1,
            iv.getField("__s") - acc.getField("c"))).as("p")),
      acc => concat(acc.getField("p"),
        slice(col("__toks"), acc.getField("c") + 1, n - acc.getField("c"))))

    // the O(tokens) walk is bound ONCE (a no-interval doc keeps its
    // token array unchanged, so kept ≡ __toks there); outCol and
    // n_removed both derive from the single __kept attribute —
    // CollapseProject refuses to inline a multiply-referenced
    // non-cheap alias, so the optimized plan carries exactly one
    // aggregate(...) (PlanAuditSpec-asserted)
    toks.join(ivs, Seq(idCol), "left")
      .select(col(idCol), col("__toks"),
        when(col("__ivs").isNull, col("__toks")).otherwise(walk).as("__kept"))
      .select(col(idCol),
        concat_ws(" ", col("__kept")).as(outCol),
        (n - size(col("__kept"))).cast(LongType).as("n_removed"))
  }
}
