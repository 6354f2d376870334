package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- sys.env.get("EXPLAIN_QUERIES").map(_.split(",").toSeq).getOrElse(Seq("q_agg", "q_filter", "q_multijoin", "q_join"))) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      println(s"[explain] ===== $q =====")
      plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Broadcast") || l.contains("SortMerge") ||
        l.contains("WholeStageCodegen") || l.contains("HashAggregate"))
        .take(12).foreach(l => println("[explain] " + l.trim.take(200)))
    }
    spark.stop()
  }
}
