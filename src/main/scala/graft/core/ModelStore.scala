package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Content-addressed store for DRIVER-TRAINED model artifacts — IVF
  * centroids, PQ codebooks, BPE merge tables, classifier weights-as-text
  * (the [[Materializer]] seam for values that are not DataFrames).
  *
  * Production pipelines train these once and apply them for months; the
  * in-query training the oracle gate uses (deterministic, seeded, cheap
  * at test scale) would retrain per job at 100 TB. The store keys each
  * artifact by (kind, params, input-data fingerprint): re-running the
  * same training over unchanged data LOADS instead of retraining, while
  * regenerated input or changed hyper-parameters miss the cache and
  * retrain — models can never be served stale, the same invalidation
  * contract as the Materializer's plan snapshots.
  *
  * Values round-trip EXACTLY: doubles are serialized with
  * `java.lang.Double.toString`, whose shortest-repr output parses back
  * to the identical bit pattern, so a loaded model produces bit-equal
  * assignments/scores to the freshly-trained one (the property every
  * hash-exact oracle in this repo rests on).
  *
  * Writes are tmp + rename (the Materializer recipe), so a concurrent
  * reader never sees a torn artifact and concurrent writers race only
  * on the rename (both write identical content — the key says so).
  */
object ModelStore {

  /** Bump when the on-disk codec changes: stale-format artifacts then
    * miss the cache instead of mis-parsing. */
  private val CodecVersion = "v1"

  /** Input-data fingerprint: path, length, mtime of every input file of
    * the frame (same recipe as [[Materializer.planKey]] — regenerated
    * source data invalidates dependent models). */
  def inputFingerprint(df: DataFrame): String = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val inputs = df.inputFiles.sorted.map { f =>
      val p = new Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
    md5(inputs.mkString("\n"))
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Load-or-train a raw text artifact. `params` must capture every
    * hyper-parameter the training depends on (they are part of the key,
    * not validated against the payload). */
  def cachedText(baseDir: String, kind: String, params: String,
                 input: DataFrame)(train: => String): String = {
    val key = md5(Seq(CodecVersion, kind, params,
      inputFingerprint(input)).mkString("\n"))
    val conf = input.sparkSession.sessionState.newHadoopConf()
    val target = new Path(baseDir, s"$kind-$key.model")
    val fs = target.getFileSystem(conf)
    if (fs.exists(target)) {
      val in = fs.open(target)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } else {
      val payload = train
      val tmp = new Path(baseDir, s".tmp_${target.getName}_" +
        java.util.UUID.randomUUID().toString.take(8))
      fs.mkdirs(new Path(baseDir))
      // sweep tmp files orphaned by a JVM that died between create and
      // rename; the age bound keeps concurrent writers' live tmps safe
      val staleBefore = System.currentTimeMillis() - 60L * 60 * 1000
      fs.listStatus(new Path(baseDir)).foreach { st =>
        if (st.getPath.getName.startsWith(".tmp_") &&
            st.getModificationTime < staleBefore)
          fs.delete(st.getPath, false)
      }
      val out = fs.create(tmp, true)
      try out.write(payload.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, target)) fs.delete(tmp, false)
      payload
    }
  }

  // ---- typed codecs --------------------------------------------------------
  private def encVec(v: Array[Double]): String =
    v.map(java.lang.Double.toString).mkString(",")
  private def decVec(s: String): Array[Double] =
    s.split(",").map(java.lang.Double.parseDouble)

  /** IVF / k-means centroids: one line per centroid. */
  def cachedCentroids(baseDir: String, params: String, input: DataFrame)
                     (train: => Seq[Array[Double]]): Seq[Array[Double]] =
    cachedText(baseDir, "centroids", params, input)(
      train.map(encVec).mkString("\n"))
      .split("\n").toSeq.filter(_.nonEmpty).map(decVec)

  /** PQ codebooks: `m` blocks of `k` centroid lines, blocks separated by
    * a bare `#` line. The degenerate empty model (`Seq()`) serializes to
    * "" — decoded explicitly, since `"".split` would yield one empty
    * block (`Seq(Seq())`) and break the round-trip. */
  def cachedCodebooks(baseDir: String, params: String, input: DataFrame)
                     (train: => Seq[Seq[Array[Double]]]): Seq[Seq[Array[Double]]] = {
    val payload = cachedText(baseDir, "codebooks", params, input)(
      train.map(_.map(encVec).mkString("\n")).mkString("\n#\n"))
    if (payload.isEmpty) Seq()
    else payload.split("\n#\n").toSeq.map(_.split("\n").toSeq
      .filter(_.nonEmpty).map(decVec))
  }

  /** BPE merge table: one `a b` line per merge, in rank order (symbols
    * never contain whitespace — the [[graft.text.Bpe]] contract — so the
    * space split is collision-free). */
  def cachedMerges(baseDir: String, params: String, input: DataFrame)
                  (train: => Seq[(String, String)]): Seq[(String, String)] =
    cachedText(baseDir, "merges", params, input)(
      train.map { case (a, b) => s"$a $b" }.mkString("\n"))
      .split("\n").toSeq.filter(_.nonEmpty).map { line =>
        val i = line.indexOf(' ')
        (line.substring(0, i), line.substring(i + 1))
      }
}
