package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with Achlioptas ±1 signs —
  * the cheap dimensionality reducer in front of cosine dedup / ANN when
  * the embedding column is wider than the distance computation needs
  * (JL: pairwise distances survive projection to k = O(log n / ε²) dims
  * within 1±ε; Achlioptas 2003 shows ±1 entries suffice, public).
  *
  * The sign matrix is DERIVED, not stored: entry (j, i) is the parity of
  * the first byte of md5("rp-<seed>-<j>-<i>") — any executor (and the
  * DuckDB oracle twin, which receives the same literals) reconstructs it
  * from (seed, dims) alone. Projection is a per-row fold over literal
  * sign arrays: map-only, whole-stage codegen, zero shuffle, nothing
  * driver-side at any corpus size — at 100 TB this is a free pass over
  * the scan.
  */
object RandomProjection {

  /** ±1 sign row for output dim j over d input dims (deterministic). */
  def signRow(seed: Long, j: Int, d: Int): Seq[Double] =
    (0 until d).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp-$seed-$j-$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }

  /** Project `vec` (array<float|double>, length d) to k dims:
    * y_j = (Σ_i vec_i · sign_ji) / √k, folded left-to-right so the
    * IEEE op order is reproducible cross-engine. */
  def project(vec: Column, d: Int, k: Int, seed: Long = 42L): Column = {
    require(k >= 1 && k <= 4096, s"target dims $k out of range")
    val v = vec.cast("array<double>")
    val rows = (0 until k).map { j =>
      val s = signRow(seed, j, d)
      val terms = zip_with(v, array(s.map(lit): _*), (a, b) => a * b)
      aggregate(terms, lit(0.0), (acc, t) => acc + t) / math.sqrt(k)
    }
    array(rows: _*)
  }

  /** DuckDB twin of [[project]] as (pos, value) rows: emits a VALUES
    * table of the identical sign rows and the identical left fold.
    * `vecExpr` must already be DOUBLE[] (cast in the caller's CTE `e`);
    * list_reduce seeds from the first element where Spark's fold seeds
    * from 0.0 — identical IEEE results (0.0 + x == x for any non-zero
    * x, and the embeddings are never exactly zero). */
  def projectSql(vecExpr: String, d: Int, k: Int,
                 seed: Long = 42L): String = {
    val values = (0 until k).map { j =>
      val s = signRow(seed, j, d).map(x =>
        if (x > 0) "1.0" else "-1.0").mkString(",")
      s"($j, [$s])"
    }.mkString(", ")
    s"""s(pos, sj) AS (VALUES $values),
       p AS (SELECT vec_id, pos,
         list_reduce(list_transform(generate_series(1, $d),
             i -> $vecExpr[i] * sj[i]),
           (a, b) -> a + b) / sqrt($k) AS value
         FROM e CROSS JOIN s)"""
  }
}
