package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One member file of an archive: the archive it came from, its path
  * inside the archive, and its bytes. */
case class ArchiveEntry(archive: String, entry: String, size: Long,
                        content: Array[Byte])

/** Tar / tar.gz / tgz / zip archive source — the OTHER container format
  * public corpora actually ship in (Gutenberg dumps, code corpora,
  * paper bundles are tarballs; many scrape collections are zips).
  *
  * Same distribution model as [[Warc.read]]: one task per archive via
  * `binaryFiles` + a LAZY entry iterator over the stream (commons-
  * compress ships with Spark), so peak memory per task is one member,
  * never the archive. Directories and zero-byte markers are skipped;
  * member bytes surface as an opaque binary column for the text/
  * multimodal operators to decode.
  */
object Archives {

  /** Load every member of every archive under `path` (directory or
    * single archive). Formats by suffix: `.tar`, `.tar.gz`/`.tgz`,
    * `.zip`. */
  def readTar(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val archives =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(st => st.isFile &&
          suffixOk(st.getPath.getName)).map(_.getPath.toString)
      else Array(path)
    if (archives.isEmpty) return spark.emptyDataset[ArchiveEntry].toDF()
    val rdd = spark.sparkContext.binaryFiles(archives.mkString(","))
      .flatMap { case (name, pds) => entryIterator(name, pds.open()) }
    spark.createDataset(rdd).toDF()
  }

  /** Store `(entry, payload)` rows as one `.tar[.gz]` per partition —
    * the round-trip sink for [[readTar]] (and the shape code/document
    * corpora are exchanged in). Same Hadoop-FS + retry-idempotent
    * tmp+rename discipline as [[Warc.write]]. */
  def writeTar(df: DataFrame, path: String,
               entry: org.apache.spark.sql.Column,
               payload: org.apache.spark.sql.Column,
               gzip: Boolean = true): Unit = {
    import org.apache.spark.sql.functions._
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val confEntries = {
      val it = hconf.iterator(); val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    val fs0 = new org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    val dir = new org.apache.hadoop.fs.Path(path)
    if (fs0.exists(dir)) fs0.delete(dir, true)
    fs0.mkdirs(dir)
    val ext = if (gzip) ".tar.gz" else ".tar"
    val rows = df.select(entry.cast("string").as("e"),
                         payload.cast("binary").as("p"))
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        val tc = org.apache.spark.TaskContext.get()
        val fin = new org.apache.hadoop.fs.Path(path,
          f"part-${tc.partitionId()}%05d$ext")
        val tmp = new org.apache.hadoop.fs.Path(path,
          f".part-${tc.partitionId()}%05d-${tc.taskAttemptId()}.tmp")
        val raw = fs.create(tmp, true)
        val out = new TarArchiveOutputStream(
          if (gzip) new java.util.zip.GZIPOutputStream(raw, 64 * 1024)
          else raw)
        out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
        try it.foreach { r =>
          val p = if (r.isNullAt(1)) Array.emptyByteArray
                  else r.getAs[Array[Byte]](1)
          val e = new TarArchiveEntry(r.getString(0))
          e.setSize(p.length.toLong)
          out.putArchiveEntry(e)
          out.write(p)
          out.closeArchiveEntry()
        } finally out.close()
        if (!fs.rename(tmp, fin)) fs.delete(tmp, false)
        ()
      }
    }
    val ok = fs0.create(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"), true)
    ok.close()
  }

  /** STREAMING archive ingestion: each archive that lands under `dir`
    * becomes a micro-batch of members — the tarball twin of
    * [[Warc.readStream]], same `binaryFile` file-stream mechanics. */
  def readTarStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    val binSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binSchema)
      .option("pathGlobFilter", "*.{tar,tar.gz,tgz,zip}")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) =>
        entryIterator(name, new java.io.ByteArrayInputStream(bytes)) }
      .toDF()
  }

  private def suffixOk(n: String): Boolean =
    n.endsWith(".tar") || n.endsWith(".tar.gz") || n.endsWith(".tgz") ||
      n.endsWith(".zip")

  private[sources] def entryIterator(name: String,
      raw: java.io.InputStream): Iterator[ArchiveEntry] = {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    import org.apache.commons.compress.archivers.zip.ZipArchiveInputStream
    // a downstream limit can abandon the iterator mid-archive: close the
    // underlying stream at task end rather than leaking it (no-op off-task)
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) {
      tc.addTaskCompletionListener[Unit] { _ =>
        try raw.close() catch { case _: java.io.IOException => () }
      }
      ()
    }
    val base = new java.io.BufferedInputStream(raw, 64 * 1024)
    val ar: org.apache.commons.compress.archivers.ArchiveInputStream[
      _ <: org.apache.commons.compress.archivers.ArchiveEntry] =
      if (name.endsWith(".zip")) new ZipArchiveInputStream(base)
      else if (name.endsWith(".tar")) new TarArchiveInputStream(base)
      else new TarArchiveInputStream(
        new java.util.zip.GZIPInputStream(base, 64 * 1024))
    new Iterator[ArchiveEntry] {
      private var nextE: ArchiveEntry = null
      private var done = false
      private def advance(): Unit = {
        while (!done && nextE == null) {
          val e = ar.getNextEntry
          if (e == null) { done = true; ar.close() }
          else if (!e.isDirectory) {
            val buf = new java.io.ByteArrayOutputStream(
              math.max(64, math.min(e.getSize, 1 << 20).toInt))
            val chunk = new Array[Byte](64 * 1024)
            var n = ar.read(chunk)
            while (n >= 0) { buf.write(chunk, 0, n); n = ar.read(chunk) }
            val bytes = buf.toByteArray
            nextE = ArchiveEntry(name, e.getName, bytes.length.toLong, bytes)
          }
        }
      }
      def hasNext: Boolean = { advance(); nextE != null }
      def next(): ArchiveEntry = {
        advance()
        if (nextE == null) throw new NoSuchElementException("archive EOF")
        val r = nextE; nextE = null; r
      }
    }
  }
}
