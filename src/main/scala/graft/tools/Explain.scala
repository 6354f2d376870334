package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
/** Plan-audit helper: prints the scale-relevant plan lines per query.
  * EXPLAIN_QUERIES = comma list, or "all" for every SparkEntry query;
  * unknown names are reported and skipped (bench-only names like
  * q_dedup_cosine_prod are not SparkEntry queries). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("EXPLAIN_SF_DIR", "/root/testdata/sf0.01")
    val requested = sys.env.get("EXPLAIN_QUERIES") match {
      case Some("all") => SparkEntry.queries.keys.toSeq.sorted
      case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None => Seq("q_agg", "q_filter", "q_multijoin", "q_join")
    }
    for (q <- requested) {
      SparkEntry.queries.get(q) match {
        case None =>
          println(s"[explain] ===== $q ===== UNKNOWN (not a SparkEntry query)")
        case Some(fn) =>
          val plan =
            try fn(spark, dir).queryExecution.executedPlan.toString
            catch { case scala.util.control.NonFatal(e) =>
              println(s"[explain] ===== $q ===== FAILED: ${e.getMessage}")
              ""
            }
          if (plan.nonEmpty) {
            println(s"[explain] ===== $q =====")
            plan.linesIterator.filter(l =>
              l.contains("PushedFilters") || l.contains("ReadSchema") ||
              l.contains("Broadcast") || l.contains("SortMerge") ||
              l.contains("WholeStageCodegen") || l.contains("HashAggregate"))
              .take(12).foreach(l => println("[explain] " + l.trim.take(200)))
          }
      }
    }
    spark.stop()
  }
}
