package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the round-7 MinHash correctness catch: the
  * per-permutation mix was a seeded xorshift, which is F2-LINEAR
  * (`xorshift(h ^ s) = xorshift(h) ^ xorshift(s)`), so every
  * "permutation" was the same ordering XOR-translated and band recall
  * collapsed (a Jaccard-0.92 pair could miss all bands with p ≈ 1/8
  * instead of the banding-math ~1e-10; observed as a planted
  * decontamination twin undetected at sf0.1 and invisible at sf0.01).
  * The planted-recall specs PASSED under the broken mix — these two
  * properties are the ones that fail if splitmix64 is ever reverted to
  * a linear mix. No SparkSession needed: singleton inputs expose the
  * raw per-seed mix through the expression itself.
  */
class MinhashIndependenceSpec extends AnyFunSuite {

  private val K = 32

  /** Evaluate the minhash signature of a raw element-hash set. */
  private def sig(elems: Array[Long], k: Int = K): Array[Long] =
    XorshiftMinhash(
      Literal.create(elems, ArrayType(LongType, containsNull = false)), k)
      .eval(null).asInstanceOf[ArrayData].toLongArray()

  /** The per-seed mix itself: a singleton set's signature entry j IS
    * mix_j(h) (the min over one element). */
  private def mix(h: Long): Array[Long] = sig(Array(h))

  test("per-seed mix is NOT affine over GF(2) (fails under the old xorshift mix)") {
    // For any affine-linear map m (the xorshift era): m(a^b) ^ m(a) ^
    // m(b) ^ m(0) == 0 identically. splitmix64's multiplies carry bits
    // across lanes, so the combination is ~uniform and never zero in
    // practice. Assert it is non-zero for EVERY seed on every trial —
    // one zero would be a 2^-64 fluke under a sound mix, but certain
    // under a linear one.
    val rnd = new scala.util.Random(7L)
    val m0 = mix(0L)
    (1 to 200).foreach { _ =>
      val a = rnd.nextLong(); val b = rnd.nextLong()
      val ma = mix(a); val mb = mix(b); val mab = mix(a ^ b)
      (0 until K).foreach { j =>
        assert((mab(j) ^ ma(j) ^ mb(j) ^ m0(j)) != 0L,
          s"seed $j behaves GF(2)-affinely on ($a, $b) — the minhash mix " +
            "has regressed to a linear permutation family")
      }
    }
  }

  test("band recall on seeded Jaccard-0.95 pairs matches the banding math") {
    // 1000 pairs sharing 95 of 100 element hashes (J = 95/105 ≈ 0.905;
    // per-band collision at r = 4 rows: 0.905^4 ≈ 0.67, miss-all-8 ≈
    // (0.33)^8 ≈ 1.4e-4 under INDEPENDENT permutations). Assert ≤10
    // misses in 1000 — comfortable under independence (expect ~0.14).
    // NOTE: measured under a reverted xorshift mix, THIS test's miss
    // count stayed under threshold for this synthetic profile (the
    // linear-family collapse bites hardest on real shingle-hash
    // distributions at sf0.1 density); the GF(2)-affinity test above is
    // the guard that fails on revert — this one pins the banding-math
    // recall promise end-to-end through the expression.
    val bands = 8
    val rows = K / bands
    val rnd = new scala.util.Random(13L)
    var misses = 0
    (1 to 1000).foreach { _ =>
      val shared = Array.fill(95)(rnd.nextLong())
      val aOnly = Array.fill(5)(rnd.nextLong())
      val bOnly = Array.fill(5)(rnd.nextLong())
      val sa = sig(shared ++ aOnly)
      val sb = sig(shared ++ bOnly)
      val collides = (0 until bands).exists { b =>
        (0 until rows).forall(r => sa(b * rows + r) == sb(b * rows + r))
      }
      if (!collides) misses += 1
    }
    assert(misses <= 10,
      s"$misses/1000 high-Jaccard pairs missed every LSH band — " +
        "permutation independence has collapsed (expected ≲1 miss)")
  }
}
