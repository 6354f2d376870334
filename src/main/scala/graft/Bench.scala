package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query at the driver-chosen
  * scale factor and prints one JSON line. A warm-up action runs first so
  * JVM/codegen startup is not attributed to the first query; queries run
  * in sorted name order for stable attribution. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: session init, parquet footer reads, first codegen
    graft.core.Tables(spark, sfDir, "lineitem").limit(10).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd.count() evaluates the FULL projection: a DataFrame count()
      // lets Catalyst prune every computed column, so map-only queries
      // would benchmark an empty-schema scan instead of their real work
      val ok =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries persist their own intermediates; drop them so later
      // queries aren't taxed by accumulated cache blocks / GC pressure
      spark.sqlContext.clearCache()
      name -> (if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
