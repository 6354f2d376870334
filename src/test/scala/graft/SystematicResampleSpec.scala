package graft

import org.apache.spark.sql.functions._
import graft.core.Pipe

/** Systematic weighted resampling: exact equality with a BigInt
  * rational model (grid points (2j+1)W/(2k) laid over cumulative
  * intervals), plus the invariants — Σ multiplicity = k exactly,
  * E[mᵢ] = k·wᵢ/W within deterministic rounding (⌊⌋/⌈⌉ bounds), zero
  * weights never selected, negative weights fail fast. */
class SystematicResampleSpec extends SparkSpec {
  import spark.implicits._

  private def model(ws: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    // ws: (id, weight) in id order; grid point j lies in doc i's
    // interval iff 2kc_i <= (2j+1)W < 2k(c_i+w_i), all in BigInt
    val total = BigInt(ws.map(_._2).sum)
    var c = BigInt(0)
    val out = Map.newBuilder[Long, Long]
    ws.foreach { case (id, w) =>
      val lo = BigInt(2L * k) * c
      val hi = BigInt(2L * k) * (c + w)
      val m = (0 until k).count { j =>
        val q = BigInt(2 * j + 1) * total
        q >= lo && q < hi
      }
      if (m > 0) out += id -> m.toLong
      c += w
    }
    out.result()
  }

  private def run(ws: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    Pipe(ws.toDF("id", "w"))
      .systematicResample(col("w"), k, col("id")).df
      .select("id", "multiplicity").as[(Long, Long)].collect().toMap

  test("equals the BigInt rational model on seeded random weights") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val ws = (0L until 50L).map(i =>
        (i, rnd.nextInt(1000).toLong)) // zeros occur
      for (k <- Seq(1, 7, 50, 173)) {
        val got = run(ws, k)
        assert(got == model(ws, k), s"seed=$seed k=$k")
        assert(got.values.sum == k, s"seed=$seed k=$k sums to k")
        // deterministic rounding bounds around the expected count
        val total = ws.map(_._2).sum.toDouble
        ws.foreach { case (id, w) =>
          val exp = k * w / total
          val m = got.getOrElse(id, 0L).toDouble
          assert(m >= math.floor(exp) - 1 && m <= math.ceil(exp) + 1,
            s"seed=$seed k=$k id=$id m=$m exp=$exp")
        }
        // zero-weight rows are never selected
        ws.filter(_._2 == 0L).foreach { case (id, _) =>
          assert(!got.contains(id)) }
      }
    }
  }

  test("huge weights stay exact (the DECIMAL(38,0) path)") {
    // weights near 2^60: 2kW would overflow long arithmetic
    val ws = Seq((1L, 1L << 60), (2L, 1L << 59), (3L, 1L))
    val got = run(ws, 3)
    assert(got == model(ws, 3), got.toString)
    assert(got.values.sum == 3)
  }

  test("negative weights fail fast; all-zero weights fail fast") {
    val err = intercept[IllegalArgumentException] {
      run(Seq((1L, 5L), (2L, -1L)), 2)
    }
    assert(err.getMessage.contains("negative weight"))
    val err2 = intercept[IllegalArgumentException] {
      run(Seq((1L, 0L)), 2)
    }
    assert(err2.getMessage.contains("total weight is 0"))
  }
}
