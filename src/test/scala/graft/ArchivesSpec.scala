package graft

import org.apache.spark.sql.functions._
import graft.sources.Archives

class ArchivesSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def tmp(name: String) = {
    val d = new java.io.File(s"target/graft-test/arch-$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    if (d.exists()) rm(d)
    d.getAbsolutePath
  }

  private def roundtrip(gz: Boolean): Unit = {
    val path = tmp(if (gz) "tgz" else "tar")
    Archives.writeTar(docs.repartition(3), path,
      entry = concat(lit("c/d-"), col("doc_id"), lit(".txt")),
      payload = col("text"), gzip = gz)
    val back = Archives.readTar(spark, path)
      .select(regexp_extract(col("entry"), "(\\d+)\\.txt$", 1)
                .cast("long").as("id"),
              col("content").cast("string").as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val want = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    assert(back.sameElements(want))
  }

  test("tar round-trips the documents table") { roundtrip(gz = false) }
  test("tar.gz round-trips the documents table") { roundtrip(gz = true) }

  test("zip archives read too; directories and long names survive") {
    val path = tmp("zip")
    new java.io.File(path).mkdirs()
    val f = new java.io.File(path, "corpus.zip")
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(f))
    val longName = "deep/" + ("x" * 120) + "/member-1.txt"
    zos.putNextEntry(new java.util.zip.ZipEntry("dir/"))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry(longName))
    zos.write("long body".getBytes("UTF-8")); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("empty.txt"))
    zos.closeEntry()
    zos.close()
    val got = Archives.readTar(spark, path)
      .select(col("entry"), col("content").cast("string").as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == 2) // directory entry skipped
    assert(got(longName) == "long body")
    assert(got("empty.txt") == "")
  }
}
