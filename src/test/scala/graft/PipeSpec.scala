package graft

import org.apache.spark.sql.functions._
import graft.core.Pipe

/** Misc infra coverage (SURVEY.md §2 rows 52–56). */
class PipeSpec extends SparkSpec {
  import spark.implicits._

  test("timed wraps an action and reports wall seconds") {
    val ((cnt, secs)) = Pipe(Seq(1, 2, 3).toDF("v")).timed(_.count())
    assert(cnt == 3L && secs > 0.0)
  }

  test("describe and isEmpty") {
    val p = Pipe(Seq((1, "a")).toDF("k", "v"))
    assert(p.describe.contains("k") && p.describe.contains("v"))
    assert(!p.isEmpty)
    assert(Pipe(spark.emptyDataFrame).isEmpty)
  }

  test("rscript is a documented unsupported stub") {
    intercept[UnsupportedOperationException] {
      Pipe(Seq(1).toDF("v")).rscript("x <- 1")
    }
  }

  test("split branches cover the predicate space") {
    val branches = Pipe(Seq(1, 2, 3, 4).toDF("v"))
      .splitInto(col("v") <= 2, col("v") > 2)
    assert(branches.map(_.df.count()).sum == 4)
  }

  test("materialize round-trips through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mat").toString
    val p = Pipe(Seq((1L, "x")).toDF("id", "s")).materialize(s"$dir/m")
    assert(p.df.collect().head.getLong(0) == 1L)
  }

  test("partitionBy co-locates keys") {
    val p = Pipe(Seq((1, "a"), (2, "b"), (1, "c")).toDF("k", "v"))
      .partitionBy(4, col("k"))
    assert(p.df.rdd.getNumPartitions == 4)
  }
}
