package graft

import org.apache.spark.sql.functions._
import graft.core.Pipe
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.Decontaminate

/** Round-5 curation additions: mixture sampling toward a target
  * composition, fuzzy (MinHash-LSH) benchmark decontamination, and
  * SemDeDup-style cluster-scoped semantic dedup. */
class MixtureSampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // 400 en / 100 de / 50 fr / 30 zz rows with unique ids
    val rows =
      (0 until 400).map(i => (i.toLong, "en")) ++
      (0 until 100).map(i => (1000L + i, "de")) ++
      (0 until 50).map(i => (2000L + i, "fr")) ++
      (0 until 30).map(i => (3000L + i, "zz"))
    rows.toDF("id", "lang")
  }

  test("mixture approximates the target composition; binding stratum kept whole") {
    // targets 50/25/25; fr binds: T = min(400/.5, 100/.25, 50/.25) = 200
    // → pct en = floor(100·.5·200/400) = 25, de = 50, fr = 100
    val out = Pipe(corpus)
      .mixtureSampleByHash(col("lang"),
        Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), col("id"))
      .df
    val byLang = out.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    // fr keeps 100% deterministically; en/de are md5-bucket filtered at
    // the derived pcts — counts concentrate near pct% of the stratum
    assert(byLang("fr") == 50L)
    assert(!byLang.contains("zz"), "non-target strata must be dropped")
    assert(byLang("en") > 60 && byLang("en") < 140) // 25% of 400 = 100
    assert(byLang("de") > 30 && byLang("de") < 70)  // 50% of 100 = 50
    // schema passes through unchanged (helper columns dropped)
    assert(out.columns.toSeq == Seq("id", "lang"))
  }

  test("mixture sampling is deterministic and a subset of the input") {
    val a = Pipe(corpus).mixtureSampleByHash(col("lang"),
        Map("en" -> 0.5, "de" -> 0.5), col("id"))
      .df.select("id").as[Long].collect().sorted.toSeq
    val b = Pipe(corpus).mixtureSampleByHash(col("lang"),
        Map("en" -> 0.5, "de" -> 0.5), col("id"))
      .df.select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    val ids = corpus.select("id").as[Long].collect().toSet
    assert(a.forall(ids))
  }

  test("temperature rebalancing: α=1 keeps all, α=0 flattens toward the " +
      "smallest group, smallest group always kept whole") {
    // α=1: every rate is floor(100·ratio^0) = 100 → identity
    val all = Pipe(corpus)
      .temperatureSampleByHash(col("lang"), 1.0, col("id")).df
    assert(all.count() == corpus.count())
    // α=0: rate_g = floor(100·n_min/n_g) → every group ≈ n_min rows
    val flat = Pipe(corpus)
      .temperatureSampleByHash(col("lang"), 0.0, col("id")).df
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(flat("zz") == 30L, "smallest group must be kept in full")
    // en keeps floor(100·30/400)=7% of 400 = ~28, de floor(30)=30% of
    // 100 = ~30 — md5-bucket noise bands
    assert(flat("en") > 12 && flat("en") < 48, flat.toString)
    assert(flat("de") > 15 && flat("de") < 45, flat.toString)
    // α=0.5 sits between natural and flat for the largest group
    val half = Pipe(corpus)
      .temperatureSampleByHash(col("lang"), 0.5, col("id")).df
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(half("zz") == 30L)
    assert(half("en") > flat("en") && half("en") < 400L, half.toString)
    // determinism + subset
    val again = Pipe(corpus)
      .temperatureSampleByHash(col("lang"), 0.5, col("id")).df
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(again == half)
  }

  test("topFracByGroup keeps exactly ceil(pct*n/100) best rows per group") {
    // scores = id so the kept set is checkable exactly; group sizes 7 and
    // 10 exercise the ceil boundary (25% of 7 = 1.75 → 2)
    val df = ((0 until 7).map(i => (i.toLong, "a", i.toLong)) ++
      (0 until 10).map(i => (100L + i, "b", i.toLong)))
      .toDF("id", "grp", "score")
    val out = Pipe(df).topFracByGroup(col("grp"), 25, col("score"),
        col("id")).df
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    // a: ceil(7·25/100)=2 → top scores 6,5; b: ceil(10·25/100)=3 → 9,8,7
    assert(out == Set(("a", 6L), ("a", 5L),
      ("b", 109L), ("b", 108L), ("b", 107L)), out.toString)
    // pct=100 is the identity
    assert(Pipe(df).topFracByGroup(col("grp"), 100, col("score"),
      col("id")).df.count() == 17L)
    // ties resolve by the tie key: equal scores keep the LOWEST ids
    val tied = (0 until 8).map(i => (i.toLong, "t", 1L)).toDF("id", "grp", "score")
    val kept = Pipe(tied).topFracByGroup(col("grp"), 50, col("score"),
      col("id")).df.select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      Pipe(df).topFracByGroup(col("grp"), 0, col("score"), col("id"))
    }
    intercept[IllegalArgumentException] {
      Pipe(df).topFracByGroup(col("grp"), 25, col("score"))
    }
  }

  test("temperature rejects bad alpha and reserved columns") {
    intercept[IllegalArgumentException] {
      Pipe(corpus).temperatureSampleByHash(col("lang"), 1.5, col("id"))
    }
    intercept[IllegalArgumentException] {
      Pipe(corpus.withColumnRenamed("lang", "__grp"))
        .temperatureSampleByHash(col("__grp"), 0.5, col("id"))
    }
  }

  test("mixture rejects bad targets and reserved columns") {
    intercept[IllegalArgumentException] {
      Pipe(corpus).mixtureSampleByHash(col("lang"), Map.empty, col("id"))
    }
    intercept[IllegalArgumentException] {
      Pipe(corpus).mixtureSampleByHash(col("lang"),
        Map("en" -> 0.0), col("id"))
    }
    intercept[IllegalArgumentException] {
      Pipe(corpus.withColumnRenamed("lang", "__grp"))
        .mixtureSampleByHash(col("__grp"), Map("en" -> 1.0), col("id"))
    }
  }
}

class FuzzyDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzyReport flags paraphrased benchmark twins that exact n-grams miss") {
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
      (2L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("bid", "btext")
    val corpus = Seq(
      // twin of bench 1 with the MIDDLE word swapped (token 7 of 14):
      // every one of the seven 8-grams spans it, so exact 8-gram overlap
      // is zero, but 3-gram Jaccard stays 9/15 = 0.6 — the fuzzy pass
      // must flag it
      (10L, "alpha beta gamma delta epsilon zeta OMEGA theta iota kappa lambda mu nu xi"),
      (11L, "completely unrelated text about something else entirely here today"),
      (12L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("id", "text")
    val exact = Decontaminate.report(corpus, "id", "text",
      bench, "bid", "btext", n = 8).select("id").as[Long].collect().toSet
    assert(!exact.contains(10L), "exact 8-grams should miss the paraphrase")
    // 64/32 banding (r=2): detection at j=0.6 is 1-(1-0.36)^32 ≈ 1-6e-7
    val fuzzy = Decontaminate.fuzzyReport(corpus, "id", "text",
      bench, "bid", "btext", numHashes = 64, bands = 32, threshold = 0.5)
    val rows = fuzzy.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.contains(10L), "fuzzy must flag the mid-doc paraphrase")
    assert(rows.contains(12L), "verbatim copy flagged")
    assert(rows(12L)._2 == 1.0, "verbatim copy has Jaccard 1")
    assert(!rows.contains(11L), "unrelated doc not flagged")
  }

  test("fuzzyClean removes exactly the flagged docs") {
    val bench = Seq((1L, "a b c d e f g h i j")).toDF("bid", "btext")
    val corpus = Seq(
      (10L, "a b c d e f g h i j"),
      (11L, "totally different words with no overlap at all whatsoever"))
      .toDF("id", "text")
    val kept = Decontaminate.fuzzyClean(corpus, "id", "text",
      bench, "bid", "btext", threshold = 0.5)
      .select("id").as[Long].collect().toSeq
    assert(kept == Seq(11L))
  }

  test("fuzzyReport rejects indivisible band decomposition") {
    val d = Seq((1L, "x")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Decontaminate.fuzzyReport(d, "id", "text", d, "id", "text",
        numHashes = 10, bands = 3)
    }
  }
}

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters on the unit sphere in 4-d, plus twins
  private def vecs = Seq(
    (1L, Array(1.0, 0.0, 0.0, 0.0)),
    (2L, Array(0.9999, 0.0141, 0.0, 0.0)),  // twin of 1 (cos ≈ 0.9999)
    (3L, Array(0.0, 0.0, 1.0, 0.0)),
    (4L, Array(0.0, 0.0, 0.9999, 0.0141)),  // twin of 3
    (5L, Array(0.92, 0.3919, 0.0, 0.0))     // near 1/2 (cos ≈ 0.92), not a twin
  ).toDF("id", "v")

  private val centroids =
    Seq(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 1.0, 0.0))

  test("semanticPairs finds within-cluster twins only") {
    val pairs = Dedup.semanticPairs(vecs, "id", "v", centroids,
        threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("pairs crossing a cluster boundary are missed by design") {
    // at threshold 0.9 the pairs (1,5) [cos .92] and (2,5) [cos ≈ .925]
    // qualify — but a quantizer whose second centroid captures 5 splits
    // them into different cells, and the pairs disappear (the documented
    // SemDeDup approximation); (1,2) and (3,4) stay within their cells
    val splitCents =
      Seq(Array(1.0, 0.0, 0.0, 0.0), Array(0.8, 0.6, 0.0, 0.0))
    val pairs = Dedup.semanticPairs(vecs, "id", "v", splitCents,
        threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
    assert(!pairs.contains((1L, 5L)) && !pairs.contains((2L, 5L)))
  }

  test("semanticDedup keeps one representative per duplicate group") {
    val kept = Dedup.semanticDedup(vecs, "id", "v", centroids,
        threshold = 0.999)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
  }

  test("assignment ties break to the lowest centroid index like the oracle") {
    val v = Seq((1L, Array(0.0, 1.0, 0.0, 0.0))).toDF("id", "v")
    // equidistant (dot 0) from both centroids → cell 0
    val cell = v.select(element_at(
        Similarity.probeCells(col("v").cast("array<double>"), centroids, 1), 1))
      .as[Int].head()
    assert(cell == 0)
  }
}

/** Gopher rule filter (Rae et al. 2021 A1.1): planted violations per
  * rule, healthy prose passes. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.TextOps

  private def rulesOf(text: String) =
    Seq((1L, text)).toDF("id", "text")
      .select(TextOps.gopherRules(col("text"), minWords = 5L).as("g"))
      .select("g.*").collect().head

  private val healthy =
    "the quick brown fox jumps over that lazy dog and runs off " +
      "to be fed with more of the usual dinner"

  test("healthy prose passes every rule") {
    val r = rulesOf(healthy)
    assert(r.getAs[Boolean]("keep"), r.toString)
    assert(r.getAs[Long]("stop_hits") >= 2L)
    assert(r.getAs[Double]("alpha_frac") == 1.0)
  }

  test("word-count, symbol and alpha violations each flip keep") {
    // too short
    assert(!rulesOf("the and of that").getAs[Boolean]("keep"))
    // hash-spam: symbol ratio over 0.1
    val hashy = rulesOf(healthy + " # # # # # #")
    assert(hashy.getAs[Double]("symbol_ratio") > 0.1)
    assert(!hashy.getAs[Boolean]("keep"))
    // numeric junk: alpha fraction under 0.8
    val nums = rulesOf("the and of that have 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16")
    assert(nums.getAs[Double]("alpha_frac") < 0.8)
    assert(!nums.getAs[Boolean]("keep"))
  }

  test("bullet and ellipsis line fractions count non-blank lines") {
    val bullets = (1 to 19).map(i => s"- item $i").mkString("\n") +
      "\nthe closing line with that and of to have be\n\n"
    val r = rulesOf(bullets)
    assert(r.getAs[Double]("bullet_frac") == 19.0 / 20.0)
    assert(!r.getAs[Boolean]("keep"))
    val dots = rulesOf(
      "the first line trails off…\nthe second one too...\nthe stable and " +
        "final line of that text ends here with nothing to hide")
    assert(dots.getAs[Double]("ellipsis_frac") == 2.0 / 3.0)
    assert(!dots.getAs[Boolean]("keep"))
  }

  test("stop_hits counts DISTINCT gopher stop words") {
    val r = rulesOf("the the the the the quick words here again again")
    assert(r.getAs[Long]("stop_hits") == 1L)
    assert(!r.getAs[Boolean]("keep"))
  }
}

/** Round-8: bloom-prefiltered exact decontamination. The prefilter must
  * be INVISIBLE in the output (no false negatives + exact re-verify) and
  * visible in the plan (the corpus filtered by the native bloom
  * expression before any explode). */
class BloomDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // 120 distinct filler docs + two planted leaks: a verbatim benchmark
  // copy and a twin sharing a 9-token run (two overlapping 8-grams)
  private def bench = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten"))
    .toDF("bid", "btext")
  private def corpus = {
    val filler = (0 until 120).map(i =>
      (100L + i, s"filler_${i}_a word_${i}_b token_${i}_c item_${i}_d " +
        s"gap_${i}_e noise_${i}_f pad_${i}_g tail_${i}_h end_${i}_i"))
    val leaks = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "PREFIX one two three four five six seven eight nine SUFFIX"))
    (filler ++ leaks).toDF("id", "text")
  }

  test("reportBloom is output-identical to report") {
    val exact = Decontaminate.report(corpus, "id", "text",
      bench, "bid", "btext", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloomed = Decontaminate.reportBloom(corpus, "id", "text",
      bench, "bid", "btext", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty, "planted leaks must be flagged")
    assert(exact.map(_._1) == Set(10L, 11L))
    assert(bloomed == exact)
  }

  test("cleanBloom equals clean") {
    val a = Decontaminate.clean(corpus, "id", "text",
      bench, "bid", "btext", n = 8).select("id").as[Long].collect().toSet
    val b = Decontaminate.cleanBloom(corpus, "id", "text",
      bench, "bid", "btext", n = 8).select("id").as[Long].collect().toSet
    assert(a == b && !a.contains(10L) && !a.contains(11L) &&
      a.contains(100L))
  }

  test("the bloom gate sits in the plan and the filter has no false negatives") {
    // a LocalRelation corpus would let ConvertToLocalRelation evaluate
    // the bloom filter at optimization time — use the production shape
    // (a parquet scan) so the gate is visible in the plan
    val pq = java.nio.file.Files.createTempDirectory("graft_bloom_plan")
      .resolve("corpus.parquet").toString
    corpus.write.mode("overwrite").parquet(pq)
    val plan = Decontaminate.reportBloom(spark.read.parquet(pq), "id", "text",
      bench, "bid", "btext", n = 8)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_bloom_any"),
      "corpus must be gated by the native bloom expression")
    // expression-level: every member long answers true (bloom contract)
    val grams = graft.dedup.Dedup.hashedShingleDF(
        bench, "bid", "btext", 8)
      .select(explode(col("sh")).as("g"))
    val bloom = graft.functions.BloomMightContainAny
      .broadcastBloom(grams, "g", fpp = 0.01)
    val misses = grams.groupBy().agg(collect_list(col("g")).as("gs"))
      .select(graft.functions.BloomMightContainAny(col("gs"), bloom))
      .as[Boolean].collect()
    assert(misses.forall(identity))
  }
}
