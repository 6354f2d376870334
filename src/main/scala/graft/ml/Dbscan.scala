package graft.ml

import scala.collection.mutable

/** Density-based clustering (DBSCAN, Ester et al. KDD'96).
  *
  * reference: the rscript.pig integration case (src/it/resources/rscript.pig)
  * clusters a point matrix with R's `fpc::dbscan(inp, eps=.3, MinPts=5)`;
  * this is the JVM implementation behind graft's builtin RSCRIPT engine
  * ([[graft.r.MiniR]]). Semantics match fpc's conventions, validated
  * bit-for-bit against the reference's own truth file
  * (src/it/resources/truth/cluster.data):
  *   - a point's eps-neighborhood INCLUDES the point itself;
  *   - neighborhood test is `dist <= eps` (Euclidean, any dimension);
  *   - cluster ids are assigned in first-core-point row order (1, 2, ...);
  *   - noise points get id 0; a noise point within eps of a later-found
  *     core point is absorbed as a border point of that cluster.
  *
  * This is a LOCAL (in-memory) algorithm, used where the reference's
  * RSCRIPT collects a whole relation into one R matrix. The distributed
  * analog for large data is [[graft.dedup.Dedup.connectedComponents]] over
  * an eps-distance self-join (grid-bucketed, see graft.spatial) — DBSCAN
  * at 100 TB is a different operator (core-point density join) and the
  * RSCRIPT path deliberately stays whole-matrix like the reference.
  */
object Dbscan {

  /** @return one cluster id per input row: 0 = noise, clusters are 1..k. */
  def fit(points: Array[Array[Double]], eps: Double, minPts: Int): Array[Int] = {
    val n = points.length
    val labels = Array.fill(n)(0) // 0 = unvisited-or-noise
    if (n == 0) return labels
    val eps2 = eps * eps

    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // neighborhoods are computed once; n is bounded by what fits one
    // executor (the whole-matrix RSCRIPT contract), so O(n^2) scan is fine
    val neigh: Array[Array[Int]] = Array.tabulate(n) { i =>
      val b = mutable.ArrayBuffer.empty[Int]
      var j = 0
      while (j < n) { if (dist2(points(i), points(j)) <= eps2) b += j; j += 1 }
      b.toArray
    }
    val isCore = Array.tabulate(n)(i => neigh(i).length >= minPts)

    var cluster = 0
    val queue = mutable.Queue.empty[Int]
    var i = 0
    while (i < n) {
      if (labels(i) == 0 && isCore(i)) {
        cluster += 1
        labels(i) = cluster
        queue.clear()
        queue += i
        while (queue.nonEmpty) {
          val p = queue.dequeue()
          neigh(p).foreach { q =>
            if (labels(q) == 0) {
              labels(q) = cluster
              if (isCore(q)) queue += q
            }
          }
        }
      }
      i += 1
    }
    labels
  }
}
