package graft

import org.apache.spark.sql.functions._

/** Differential testing for the distributed grid-partitioned DBSCAN:
  * seeded random lattice points (duplicates and exactly-eps boundary
  * pairs arise by construction) checked two ways —
  *  1. EXACTLY against a plain-Scala model of the documented distributed
  *     semantics (weighted core counts over coordinate groups, min-core-id
  *     component labels, border takes the min neighboring core's label,
  *     noise is null);
  *  2. against the sequential [[graft.ml.Dbscan.fit]] on the
  *     implementation-independent invariants (same noise set, same core
  *     partition) — border assignment is scan-order luck sequentially, so
  *     only cores constrain the partition.
  * Both implementations compare squared distance to eps², so the model
  * does too — boundary-exact pairs cannot diverge on sqrt rounding. */
class DbscanDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private case class Model(label: Map[Long, Option[Long]])

  /** Plain-Scala replay of fitDistributed's documented semantics. */
  private def model(pts: IndexedSeq[(Long, Double, Double)],
                    eps: Double, minPts: Int): Model = {
    val eps2 = eps * eps
    def near(a: (Double, Double), b: (Double, Double)) = {
      val dx = a._1 - b._1; val dy = a._2 - b._2
      dx * dx + dy * dy <= eps2
    }
    // coordinate groups: gid = min point id, cnt = multiplicity
    val groups = pts.groupBy(p => (p._2, p._3)).map { case (xy, ps) =>
      (xy, ps.map(_._1).min, ps.size)
    }.toIndexedSeq
    val neigh = groups.map { case (xy, _, _) =>
      groups.filter(g => near(xy, g._1)) }
    val coreIdx = groups.indices.filter(i =>
      neigh(i).map(_._3).sum >= minPts).toSet
    // connected components over core groups (eps graph), label = min gid
    val gidOf = groups.map(_._2)
    val parent = scala.collection.mutable.Map(
      coreIdx.toSeq.map(i => i -> i): _*)
    def find(i: Int): Int =
      if (parent(i) == i) i else { val r = find(parent(i)); parent(i) = r; r }
    for (i <- coreIdx; j <- coreIdx if i < j
         if near(groups(i)._1, groups(j)._1)) {
      val (ri, rj) = (find(i), find(j)); if (ri != rj) parent(ri) = rj
    }
    val compLabel = coreIdx.groupBy(find).flatMap { case (_, members) =>
      val lbl = members.map(gidOf).min; members.map(_ -> lbl) }
    val groupLabel: Map[Int, Option[Long]] = groups.indices.map { i =>
      if (coreIdx(i)) i -> Some(compLabel(i))
      else {
        val coreNeighbors = groups.indices.filter(j =>
          coreIdx(j) && near(groups(i)._1, groups(j)._1))
        i -> (if (coreNeighbors.isEmpty) None
              else Some(coreNeighbors.map(compLabel).min))
      }
    }.toMap
    val byCoord = groups.indices.map(i => groups(i)._1 -> groupLabel(i)).toMap
    Model(pts.map(p => p._1 -> byCoord((p._2, p._3))).toMap)
  }

  test("fitDistributed equals the exact model and the sequential " +
      "invariants on random lattice data") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(500 + seed)
      // small lattice -> duplicates and exactly-eps pairs by construction
      val pts = (1 to 110).map(i =>
        (i.toLong, rnd.nextInt(25) / 4.0, rnd.nextInt(25) / 4.0))
      val eps = if (seed % 2 == 0) 0.5 else 0.75
      val minPts = 3 + 2 * (seed % 2)
      // seed 1 forces the ITERATIVE distributed-components path; others
      // take the driver union-find shortcut
      val thr = if (seed == 1) 0L else 5000000L
      val df = pts.toDF("id", "x", "y").repartition(5)
      val got = graft.ml.Dbscan
        .fitDistributed(df, "id", Seq("x", "y"), eps, minPts,
          ccDriverEdgeThreshold = thr)
        .select("id", "cluster").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

      val m = model(pts, eps, minPts)
      assert(got == m.label, s"seed=$seed eps=$eps minPts=$minPts " +
        s"diff=${(got.toSet -- m.label.toSet).take(4)}")

      // sequential cross-check: same noise set, same core partition
      val seq = graft.ml.Dbscan.fit(
        pts.map(p => Array(p._2, p._3)).toArray, eps, minPts)
      val seqNoise = pts.indices.filter(i => seq(i) == 0)
        .map(i => pts(i)._1).toSet
      val gotNoise = got.collect { case (i, None) => i }.toSet
      assert(gotNoise == seqNoise, s"seed=$seed noise sets differ")
      // cores: recompute core status directly (count within eps >= minPts)
      val eps2 = eps * eps
      def isCore(i: Int) = pts.count { q =>
        val dx = pts(i)._2 - q._2; val dy = pts(i)._3 - q._3
        dx * dx + dy * dy <= eps2 } >= minPts
      val corePartSeq = pts.indices.filter(isCore)
        .groupBy(i => seq(i)).values.map(_.map(i => pts(i)._1).toSet).toSet
      val corePartDist = pts.indices.filter(isCore)
        .groupBy(i => got(pts(i)._1)).values
        .map(_.map(i => pts(i)._1).toSet).toSet
      assert(corePartDist == corePartSeq, s"seed=$seed core partitions differ")
    }
  }
}
