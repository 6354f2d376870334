package graft

import org.apache.spark.sql.functions._
import graft.text.EditDistance

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Seeded word soup with planted substitution/insert/delete variants —
    * every edit class must survive the deletion-neighborhood filter. */
  private def corpus(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val base = Seq.fill(n)(
      (0 until 4 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(6)).toChar)
        .mkString)
    val mutated = base.flatMap { w =>
      val i = rnd.nextInt(w.length)
      Seq(w.updated(i, ('a' + rnd.nextInt(6)).toChar),           // sub
        w.substring(0, i) + w.substring(i + 1),                  // del
        w.substring(0, i) + ('a' + rnd.nextInt(6)).toChar +
          w.substring(i))                                        // ins
    }
    (base ++ mutated).distinct
  }

  test("self-join at d=1 and d=2 equals the brute-force all-pairs answer " +
      "(exact recall across sub/ins/del edit classes)") {
    val words = corpus(seed = 7, n = 40)
    val df = words.toDF("w")
    for (d <- Seq(1, 2)) {
      val got = EditDistance.fuzzySelfJoin(df, "w", d)
        .as[(String, String, Int)].collect().toSet
      val want = (for {
        a <- words; b <- words if a < b
        dist = lev(a, b) if dist >= 1 && dist <= d
      } yield (a, b, dist)).toSet
      assert(got == want, s"d=$d: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
    }
  }

  test("two-relation join keeps identity matches (dist 0) and respects " +
      "the threshold") {
    val l = Seq("kitten", "apple", "spark").toDF("x")
    val r = Seq("sitten", "apple", "sparks", "banana").toDF("y")
    val got = EditDistance.fuzzyJoin(l, r, "x", "y", maxDist = 1)
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("kitten", "sitten", 1), ("apple", "apple", 0),
      ("spark", "sparks", 1)))
  }

  test("deletionVariants d=1 is the string plus every single-char " +
      "deletion, deduplicated") {
    val vs = Seq("aab").toDF("s")
      .select(EditDistance.deletionVariants(col("s"), 1).as("v"))
      .as[Seq[String]].head().toSet
    assert(vs == Set("aab", "ab", "aa"))
    val err = intercept[IllegalArgumentException] {
      EditDistance.deletionVariants(col("s"), 3)
    }
    assert(err.getMessage.contains("maxDist 1 or 2"))
  }

  test("candidate stage never forms the cross product: plan has no " +
      "Levenshtein below the variant equi-join") {
    // the refine must sit ABOVE a hash equi-join on the variant hash —
    // a CartesianProduct or BroadcastNestedLoopJoin node would mean the
    // pigeonhole filter collapsed into all-pairs
    val df = corpus(seed = 11, n = 60).toDF("w")
    val plan = EditDistance.fuzzySelfJoin(df, "w", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
