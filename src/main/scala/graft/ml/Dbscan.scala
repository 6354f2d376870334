package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
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

  /** DISTRIBUTED density clustering — the 100 TB path (the grid-partitioned
    * DBSCAN family: MR-DBSCAN et al.). Same cluster semantics as [[fit]]
    * except labels: clusters are named by the MINIMUM point id of their
    * core set (a stable distributed representative — sequential 1..k
    * numbering is inherently order-dependent), noise gets a NULL cluster,
    * and a border point reachable from several clusters takes the smallest
    * label (the sequential algorithm's assignment there is scan-order
    * luck, not semantics).
    *
    * Shape — never all-pairs:
    *  1. eps-grid cell per point; each point replicated to its 3^d
    *     neighbor cells (d = coordCols.length — meant for LOW-d spatial
    *     data; replication is 3^d);
    *  2. neighbor pairs via the cell equi-join + exact distance refine
    *     (shuffle key = cell; AQE splits skewed dense cells);
    *  3. core test = neighbor count ≥ minPts (self included);
    *  4. core–core eps-edges → [[graft.dedup.Dedup.connectedComponents]]
    *     (min-id label propagation, checkpointed);
    *  5. border points join their core neighbors, taking the min label.
    */
  def fitDistributed(points: DataFrame, idCol: String, coordCols: Seq[String],
                     eps: Double, minPts: Int,
                     ccDriverEdgeThreshold: Long = 5000000L): DataFrame = {
    require(coordCols.nonEmpty, "dbscan: need coordinate columns")
    val d = coordCols.length
    val id = col(idCol)
    val base = points.select(id.as("__id") +:
      coordCols.zipWithIndex.map { case (c, i) => col(c).as(s"__x$i") }: _*)

    // collapse exact-duplicate coordinates FIRST: co-located points form
    // cliques — quadratic pair blowup as density grows — yet necessarily
    // share core status, cluster and border fate. Cluster the distinct
    // coordinates weighted by multiplicity, then fan labels back out.
    // Node ids are each group's min original id, so component labels stay
    // "min core point id" exactly as on raw points.
    val coords = (0 until d).map(i => col(s"__x$i"))
    val groups = graft.core.Intermediates.track(
      base.groupBy(coords: _*)
        .agg(min(col("__id")).as("__gid"), count(lit(1)).as("__cnt"))
        .persist())

    // neighbor-cell offsets: the 3^d cross product of {-1,0,1}
    val offsets: Seq[Seq[Int]] =
      (0 until d).foldLeft(Seq(Seq.empty[Int]))((acc, _) =>
        acc.flatMap(o => Seq(-1, 0, 1).map(o :+ _)))
    val offArr = array(offsets.map(o => array(o.map(lit): _*)): _*)

    val home = groups.withColumn("__cell",
      array((0 until d).map(i => floor(col(s"__x$i") / eps).cast("long")): _*))
    // each group visits all 3^d cells around its own: the join below then
    // needs only CELL EQUALITY to see every candidate within eps
    val visitedCells: Seq[Column] = (0 until d).map(i =>
      floor(col(s"__x$i") / eps).cast("long") +
        element_at(col("__off"), i + 1))
    val visited = groups.withColumn("__off", explode(offArr))
      .withColumn("__cell", array(visitedCells: _*))
      .drop("__off")

    val dist2 = (0 until d).map(i =>
      (col(s"a.__x$i") - col(s"b.__x$i")) * (col(s"a.__x$i") - col(s"b.__x$i")))
      .reduce(_ + _)
    // (a, b) for every group b within eps of a — includes b = a (dist 0),
    // with b's multiplicity aboard for the weighted neighbor count
    val pairs = graft.core.Intermediates.track(
      home.as("a").join(visited.as("b"),
          col("a.__cell") === col("b.__cell") && dist2 <= lit(eps * eps))
        .select(col("a.__gid").as("pa"), col("b.__gid").as("pb"),
          col("b.__cnt").as("__bcnt"))
        .persist())

    val counts = pairs.groupBy("pa").agg(sum(col("__bcnt")).as("__n"))
    // reused by the edge build (twice), the border join and the anti join
    val cores = graft.core.Intermediates.track(
      counts.where(col("__n") >= minPts).select(col("pa").as("__gid")).persist())

    // core–core edges (+ isolated cores as self-edges so they survive CC)
    val coreEdges = pairs
      .join(cores.withColumnRenamed("__gid", "pa"), "pa")
      .join(cores.withColumnRenamed("__gid", "pb"), "pb")
      .where(col("pa") < col("pb"))
      .select(col("pa").as("id_a"), col("pb").as("id_b"))
    val singletonCores = cores.select(col("__gid").as("id_a"),
      col("__gid").as("id_b"))
    val comp = graft.dedup.Dedup
      .connectedComponents(coreEdges.union(singletonCores), maxIter = 64,
        driverEdgeThreshold = ccDriverEdgeThreshold)
      .toDF("__gid", "__cluster") // (core group id, min-id component label)

    val coreLabeled = cores.join(comp, "__gid")
      .select(col("__gid"), col("__cluster"))
    // border groups: smallest core neighbor's label wins. coreLabeled IS
    // the core set (cores ⋈ comp), so the one join both restricts pb to
    // cores and fetches the label
    val borderLabeled = pairs
      .join(coreLabeled.withColumnRenamed("__gid", "pb")
        .withColumnRenamed("__cluster", "__bc"), "pb")
      .groupBy(col("pa").as("__gid")).agg(min(col("__bc")).as("__cluster"))
      .join(coreLabeled.select(col("__gid")), Seq("__gid"), "left_anti")

    // fan the group labels back out to the original points
    val labeled = coreLabeled.union(borderLabeled)
    val keyNames = (0 until d).map(i => s"__x$i")
    val pointGroups = base
      .join(groups.select((keyNames.map(col) :+ col("__gid")): _*), keyNames)
      .select(col("__id").as(idCol), col("__gid"))
    points.join(
        pointGroups.join(labeled, Seq("__gid"), "left")
          .select(col(idCol), col("__cluster").as("cluster")),
        Seq(idCol), "left")
  }
}
