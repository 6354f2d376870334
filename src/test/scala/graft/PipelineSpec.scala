package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.multimodal.Multimodal
import graft.queries.PipelineQueries

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount handles empty / padded strings") {
    val df = Seq("", "  ", "one", " a  b c ").toDF("text")
      .select(TextOps.tokenCount(col("text")).as("n"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 0L, 1L, 3L))
  }

  test("bpe token count splits words and punctuation") {
    val n = Seq("Hello, world! v2.0").toDF("text")
      .select(TextOps.bpeTokenCount(col("text"))).as[Long].head()
    // Hello , world ! v 2 . 0
    assert(n == 8L)
  }

  test("langId identifies scripts and stopword profiles") {
    val samples = Seq(
      "the cat sat on the mat and it was good" -> "en",
      "der Hund ist nicht mit der Katze und dem Vogel" -> "de",
      "le chat est dans la maison avec le chien" -> "fr",
      "el perro es un animal y la casa es grande" -> "es",
      "这 是 一个 中文 句子" -> "zh")
    samples.foreach { case (text, expected) =>
      val got = Seq(text).toDF("text")
        .select(TextOps.langId(col("text"))).as[String].head()
      assert(got == expected, s"for '$text'")
    }
  }

  test("quality score ranges and orders sensibly") {
    val natural = "the cat is on the mat and it was good to see that it is"
    val spam = "buy!!! now!!! $$$ click,,,,,;;;;"
    val q = Seq(natural, spam).toDF("text")
      .select(TextOps.qualityScore(col("text"))).as[Double].collect()
    assert(q(0) > q(1))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("rolling fingerprint is edit-local") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val local = base.replace("kappa", "KAPPA") // tail edit
    val fps = Seq(base, base, local).toDF("text")
      .select(TextOps.rollingFingerprint(col("text"))).as[Long].collect()
    assert(fps(0) == fps(1)) // deterministic
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("exact dedup collapses planted verbatim copies") {
    val d = docs.select(col("doc_id"), col("text"))
    val planted = d.union(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val out = Dedup.exact(planted, "doc_id", "text")
    assert(out.count() == d.count())        // one group per original
    assert(out.where(col("dup_cnt") =!= 2).count() == 0)
    // winner is always the original (smaller) id
    assert(out.where(col("keep_id") >= 1000000L).count() == 0)
  }

  test("minhash LSH recovers planted near-dups with high recall") {
    val planted = PipelineQueries.plantedDocs(docs)
    val pairs = Dedup.minhashLsh(planted, "doc_id", "text",
      numHashes = 32, bands = 8, threshold = 0.5)
    val recovered = pairs
      .where(col("id_b") === col("id_a") + 1000000L).count()
    val total = docs.count()
    assert(recovered >= (total * 0.8).toLong,
      s"recall too low: $recovered / $total")
    // and no false positives below the threshold
    assert(pairs.where(col("jaccard") < 0.5).count() == 0)
  }

  test("simhash pairs find planted near-dups, hamming bounded") {
    val planted = PipelineQueries.plantedDocs(docs)
    val sims = Dedup.simhash(planted, "doc_id", "text")
    val pairs = Dedup.simhashPairs(sims, maxDist = 3)
    val recovered = pairs.where(col("id_b") === col("id_a") + 1000000L).count()
    assert(recovered >= (docs.count() * 0.5).toLong)
    assert(pairs.where(col("hamming") > 3).count() == 0)
  }

  test("ngram jaccard exact refine matches definition") {
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"),   // high overlap with 1
      (3L, "z y x w v u t s")    // disjoint
    ).toDF("id", "text")
    val pairs = Dedup.ngramJaccard(df, "id", "text", n = 2,
      threshold = 0.3, maxDocFreq = 10).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
  }

  test("embedding cosine PRODUCTION preset (6 bands) recovers planted " +
      "pairs with near-exact recall") {
    // the default preset is the production setting the bench times as
    // q_dedup_cosine_prod: at cosine ≈ 0.999 a pair misses all 6 bands
    // with (1-(1-.0143)^10)^6 ≈ 6e-6, so recall on the planted pairs is
    // statistically indistinguishable from 1; precision is structural
    // (exact cosine refine). Assert ≥ 0.99 — a band-math regression
    // (fewer effective bands, broken bucketing) lands far below that.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val planted = PipelineQueries.plantedVecs(emb)
    val pairs = Dedup.embeddingCosine(planted, "vec_id", "embedding",
      threshold = 0.999)
    val recovered = pairs.where(col("id_b") === col("id_a") + 1000000L).count()
    assert(recovered >= (emb.count() * 0.99).toLong,
      s"production-preset recall too low: $recovered of ${emb.count()}")
  }

  test("connected components collapse transitive chains") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val ccDf = Dedup.connectedComponents(pairs)
    // the returned frame must READ the checkpointed final iteration —
    // a plan that still contains the label-propagation join would
    // re-derive it (and the convergence test would have paid it twice)
    assert(!ccDf.queryExecution.optimizedPlan.toString.contains("Join"),
      "result should scan the checkpoint, not recompute the iteration join")
    val cc = ccDf.as[(Long, Long)].collect().toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)
    assert(cc(10L) == 10L && cc(11L) == 10L)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val got = df.as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12 && math.abs(got(1)) < 1e-12)
  }

  test("native cosine Expression matches the HOF formulation bit-exactly") {
    val df = emb.select(col("embedding").cast("array<double>").as("v"),
      reverse(col("embedding").cast("array<double>")).as("w"))
    val both = df.select(
      Similarity.cosine(col("v"), col("w")).as("hof"),
      graft.functions.GraftFunctions.cosine(spark, col("v"), col("w")).as("nat"))
    assert(both.where(col("hof") =!= col("nat")).count() == 0)
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("vec"))
    val corpus = emb.where(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val exact = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(corpus, queries, 10, nCells = 16, nProbe = 8)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("LSH top-k: selective candidate budget AND high recall on clustered data") {
    // plant 10 true near-neighbours per query (perturbed query copies) —
    // the regime ANN exists for; a uniform-random corpus has no
    // neighbours to recall, so selectivity and recall would trade off
    // vacuously there
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("vec"))
    val organic = emb.where(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val rnd = new scala.util.Random(7)
    val plantedRows = queries.collect().flatMap { r =>
      val qid = r.getLong(0)
      val v = r.getSeq[Double](1).toArray
      (0 until 10).map { j =>
        (100000L + qid * 100 + j, v.map(_ + 0.02 * rnd.nextGaussian()).toSeq)
      }
    }.toSeq
    val corpus = organic.union(
      plantedRows.toDF("id", "vec").select(col("id"), col("vec")))
    val exact = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(corpus, queries, 10) // default 8 bands × 12 bits
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall too low")
    // the approximate path must stay approximate: candidates ≤ 10% of the
    // (query × corpus) space, or it is brute force with extra shuffles
    val cands = Similarity.lshCandidates(corpus, queries).count()
    val budget = 0.1 * corpus.count() * queries.count()
    assert(cands <= budget, s"LSH candidate set $cands exceeds 10% budget $budget")
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("synthetic assets carry payloads and modalities") {
    val assets = Multimodal.syntheticAssets(spark, docs)
    assert(assets.count() == docs.count())
    val mods = assets.select(col("modality")).distinct().as[String].collect().toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("batched decode is deterministic and partitioning-independent") {
    val assets = Multimodal.syntheticAssets(spark, docs)
    val a = Multimodal.decodeFeatures(assets).orderBy("id").collect()
    val b = Multimodal.decodeFeatures(assets.repartition(7)).orderBy("id").collect()
    assert(a.sameElements(b))
    assert(a.forall(_.getAs[Seq[Float]]("features").length == 8))
  }

  test("frame sampling emits one row per sampled frame, payload untouched") {
    val assets = Multimodal.syntheticAssets(spark, docs)
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000L)
    val vids = assets.filter(_.modality == "video")
    val expected = vids.map(a => math.max(1L, a.durationMs / 1000L)).collect().sum
    assert(frames.count() == expected)
  }

  test("late-fetch reattaches payloads after metadata-only wide op") {
    val assets = Multimodal.syntheticAssets(spark, docs).toDF()
    val meta = assets.select(col("id"), col("modality"))
      .groupBy("modality").agg(collect_list("id").as("ids"))
      .select(explode(col("ids")).as("id"))
    val joined = Multimodal.lateFetch(meta, assets)
    assert(joined.where(col("payload").isNull).count() == 0)
  }
}
