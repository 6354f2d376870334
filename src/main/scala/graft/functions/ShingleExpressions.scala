package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-dedup hot path.
  *
  * The higher-order-function formulation (filter∘split → transform →
  * slice/concat_ws → aggregate) evaluates every lambda through the
  * interpreted expression tree with per-element boxing — measured as the
  * dominant cost of MinHash/Jaccard dedup. These expressions run the same
  * per-row loops as compiled JVM code: one interpreted call per ROW
  * (CodegenFallback), not per element. Hashes are FNV-1a-mixed — dedup
  * only needs self-consistency, not compatibility with SQL xxhash64.
  */
object ShingleHash {
  /** 64-bit hash of a token range [from, until) joined by single spaces —
    * streaming over the tokens, no intermediate string. */
  def hashRange(tokens: Array[String], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var t = from
    while (t < until) {
      val s = tokens(t)
      var i = 0
      while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
      h = (h ^ ' ') * 0x100000001b3L
      t += 1
    }
    // avalanche (xorshift-multiply) so low-entropy inputs spread
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }

  def tokenize(text: UTF8String): Array[String] =
    text.toString.split("\\s+").filter(_.nonEmpty)
}

/** array<long> of distinct hashed word n-gram shingles of a text column.
  * Short docs (< n tokens) collapse to one whole-doc shingle. */
case class HashedShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val tokens = ShingleHash.tokenize(input.asInstanceOf[UTF8String])
    if (tokens.isEmpty) return new GenericArrayData(Array.empty[Long])
    val out =
      if (tokens.length < n) Array(ShingleHash.hashRange(tokens, 0, tokens.length))
      else {
        val m = tokens.length - n + 1
        val a = new Array[Long](m)
        var i = 0
        while (i < m) { a(i) = ShingleHash.hashRange(tokens, i, i + n); i += 1 }
        a
      }
    val distinct = new java.util.LinkedHashSet[Long]()
    out.foreach(distinct.add)
    val arr = new Array[Long](distinct.size)
    val it = distinct.iterator(); var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** k-permutation MinHash signature (array<long>) over a hashed shingle
  * array, one compiled pass. Each "permutation" is the splitmix64
  * finalizer over `h ^ seed_j`.
  *
  * The mix MUST be non-linear over GF(2). The first implementation used
  * a seeded xorshift (`xorshift(h ^ seed)`), and xorshift is an F2-linear
  * bijection, so it factored as `xorshift(h) ^ xorshift(seed)` — every
  * "permutation" was the SAME ordering XOR-translated, which makes the
  * min of a set follow the seed constant down a binary trie of the
  * element hashes. An element sitting alone near the top of that trie
  * then wins the min with probability ~1/2 PER SEED regardless of set
  * size, so a Jaccard-0.92 pair could miss all 16 LSH bands with
  * probability ~1/8 instead of the (1-j^r)^b ≈ 6e-11 the banding math
  * promises (observed: a planted decontamination twin undetected at
  * sf0.1). splitmix64's two multiply-xor-shift rounds carry bits across
  * lanes (carries are non-linear in GF(2)), restoring approximately
  * pairwise-independent orderings. Multiplication here is plain JVM
  * arithmetic inside the expression — it wraps mod 2^64 by definition;
  * SQL-level ANSI overflow checking never sees it. */
case class XorshiftMinhash(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private lazy val seeds: Array[Long] = {
    val rnd = new scala.util.Random(42L)
    Array.fill(k)(rnd.nextLong())
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h0 = hs(i)
      var j = 0
      while (j < k) {
        var x = h0 ^ seeds(j)
        x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
        x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
        x ^= x >>> 31
        if (x < sig(j)) sig(j) = x
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): XorshiftMinhash =
    copy(child = newChild)
}

/** 60-bit SimHash over md5-hashed tokens: ±1 votes per bit, packed sign
  * vector — one compiled pass instead of 60 interpreted aggregate folds.
  *
  * The per-token hash is the first 60 bits of md5 (= the first 15 hex
  * chars of the digest) rather than a bespoke mix: md5 is the one hash
  * primitive an external SQL engine computes bit-identically, so the
  * whole signature — and therefore the near-dup pair set — is exactly
  * reproducible by an independent oracle (`('0x'||substr(md5(t),1,15))
  * ::BIGINT` in DuckDB). 60 bits keeps the value positive in engines
  * without unsigned 64-bit. */
case class SimhashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val tokens = ShingleHash.tokenize(input.asInstanceOf[UTF8String])
    // provider lookup + allocation once per task thread, not once per row
    // (digest() resets the instance itself, so reuse is safe)
    val md = SimhashExpr.digests.get()
    val votes = new Array[Int](60)
    var t = 0
    while (t < tokens.length) {
      val d = md.digest(tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = top 60 bits of the first 8 digest bytes
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var packed = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) packed |= (1L << b); b += 1 }
    packed
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** Column builders (FunctionRegistry-free — used library-internally). */
object ShingleExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def hashedShingles(text: Column, n: Int): Column =
    column(HashedShingles(expression(text), n))
  def minhash(hashes: Column, k: Int): Column =
    column(XorshiftMinhash(expression(hashes), k))
  def simhash(text: Column): Column = column(SimhashExpr(expression(text)))
}
