package graft

import org.apache.spark.sql.functions._
import graft.core.Pipe

class StoreSortedSpec extends SparkSpec {

  test("shards are size-capped, internally sorted, and concatenate by " +
       "min key into the fully sorted corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val out = "target/graft-test/store-sorted"
    Pipe(docs.repartition(7)).storeSorted(out,
      Seq(col("n_chars"), col("doc_id")), maxRecordsPerFile = 50)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length >= 2, s"expected multiple shards, got ${files.length}")

    val perFile = files.map { f =>
      spark.read.parquet(f.getAbsolutePath)
        .select(col("n_chars"), col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    // size cap honored
    perFile.foreach(rows => assert(rows.length <= 50))
    // each shard internally sorted
    perFile.foreach { rows =>
      assert(rows.sameElements(rows.sorted), "shard not sorted")
    }
    // concatenation by min key == global sort of the corpus
    val stitched = perFile.filter(_.nonEmpty).sortBy(_.head).flatten
    val want = docs.select(col("n_chars"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(stitched.length == want.length)
    assert(stitched.sameElements(want), "stitched shards not globally sorted")
  }
}
