package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Materialization manager (reference: src/main/scala/dbis/piglet/mm/
  * MaterializationManager.scala + op/Materialize.scala): MATERIALIZE
  * checkpoints a dataflow to storage and later runs REUSE the checkpoint
  * instead of recomputing the subplan.
  *
  * Snapshot key = canonicalized optimized plan (expression ids
  * normalized — identical dataflows in different sessions agree) combined
  * with the input files' paths, sizes and modification times, so
  * re-generated source data invalidates the snapshot instead of being
  * silently served stale. All filesystem access goes through the Hadoop
  * FileSystem of the base path (works for hdfs://, s3a://, file:/ alike),
  * and writes land in a temp directory promoted by rename, so a
  * concurrent reader never observes a half-written snapshot.
  */
object Materializer {

  /** Stable key: semantic hash of the canonicalized plan + input-data
    * fingerprint (path, length, mtime per input file). */
  def planKey(df: DataFrame): String = {
    // full canonicalized tree string through the digest — a 32-bit
    // hashCode key would let distinct plans collide and silently serve
    // each other's snapshots
    val planHash = df.queryExecution.optimizedPlan.canonicalized.toString
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val inputs = df.inputFiles.sorted.map { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest((planHash.toString +: inputs).mkString("\n").getBytes("UTF-8"))
    digest.map("%02x".format(_)).mkString
  }

  /** Materialize-or-reuse: writes the snapshot only if none exists for
    * this (plan, input-state) key; always returns the snapshot-backed
    * DataFrame (a plain parquet scan — prunable, pushdown-able,
    * shareable across sessions). Returns (df, reused). */
  def materialize(df: DataFrame, baseDir: String): (DataFrame, Boolean) = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val target = new Path(baseDir, planKey(df))
    val fs = target.getFileSystem(conf)
    val reused = fs.exists(target)
    if (!reused) {
      // temp-write + atomic-ish rename: concurrent writers race only on
      // the rename; readers never see partial part files. NOTE the
      // Hadoop FS contract for rename-onto-existing-DIRECTORY is "move
      // the source INTO it" (returning true), not "fail" — so a losing
      // writer's snapshot would land as target/.tmp_xxx and leak. Handle
      // both loser shapes: rename returned false, or it "succeeded" by
      // nesting the tmp dir inside the winner's target.
      val tmp = new Path(baseDir,
        s".tmp_${target.getName}_${java.util.UUID.randomUUID().toString.take(8)}")
      df.write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(tmp, target)) {
        // another writer won; drop our copy
        fs.delete(tmp, true)
      } else {
        val nested = new Path(target, tmp.getName)
        if (fs.exists(nested)) fs.delete(nested, true)
      }
    }
    (spark.read.parquet(target.toString), reused)
  }
}
