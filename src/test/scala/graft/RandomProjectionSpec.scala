package graft

import org.apache.spark.sql.functions._
import graft.sim.RandomProjection

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("sign rows are deterministic, ±1, and roughly balanced") {
    val r1 = RandomProjection.signRow(42L, 3, 64)
    val r2 = RandomProjection.signRow(42L, 3, 64)
    assert(r1 == r2)
    assert(r1.forall(x => x == 1.0 || x == -1.0))
    val plus = r1.count(_ > 0)
    assert(plus >= 16 && plus <= 48, s"suspiciously unbalanced: $plus/64")
    // distinct output dims get distinct rows (independence across j)
    assert(RandomProjection.signRow(42L, 4, 64) != r1)
    assert(RandomProjection.signRow(7L, 3, 64) != r1)
  }

  test("JL property: pairwise squared distances survive 64→16 projection " +
      "within the expected distortion envelope") {
    val rnd = new scala.util.Random(123)
    val vecs = Seq.fill(40)(Array.fill(64)(rnd.nextGaussian()))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
    val proj = df.select(col("vec_id"),
        RandomProjection.project(col("embedding"), 64, 16).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- vecs.indices; j <- vecs.indices if i < j
    } yield d2(proj(i.toLong), proj(j.toLong)) /
      d2(vecs(i).toSeq, vecs(j).toSeq)
    // k=16 is a coarse sketch: E[ratio]=1, sd≈sqrt(2/16)=0.35 — the
    // MEAN over 780 pairs concentrates hard; individual pairs stay
    // within a loose envelope
    val mean = ratios.sum / ratios.size
    assert(mean > 0.85 && mean < 1.15, s"mean ratio $mean")
    assert(ratios.count(r => r > 0.2 && r < 2.5).toDouble / ratios.size
      > 0.95, "tail heavier than JL predicts")
  }

  test("projection is linear: P(a)+P(b) == P(a+b) up to fold rounding") {
    val rnd = new scala.util.Random(5)
    val a = Array.fill(64)(rnd.nextGaussian())
    val b = Array.fill(64)(rnd.nextGaussian())
    val rows = Seq(("a", a.toSeq), ("b", b.toSeq),
      ("ab", a.zip(b).map { case (x, y) => x + y }.toSeq))
    val m = rows.toDF("k", "v").select(col("k"),
        RandomProjection.project(col("v"), 64, 16).as("p"))
      .as[(String, Seq[Double])].collect().toMap
    m("a").zip(m("b")).zip(m("ab")).foreach { case ((pa, pb), pab) =>
      assert(math.abs(pa + pb - pab) < 1e-9)
    }
  }
}
