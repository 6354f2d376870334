package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.input.PortableDataStream

import java.io.{BufferedInputStream, DataOutputStream, EOFException, FilterOutputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** One parsed WARC record (ISO 28500 / IIPC WARC 1.0). `content` is the
  * raw payload block — opaque bytes, exactly `Content-Length` of them. */
case class WarcRecord(warc_type: String, record_id: String,
                      target_uri: String, warc_date: String,
                      content_type: String, content: Array[Byte])

/** WARC segment source + sink — the container format 100 TB web corpora
  * actually arrive in (Common Crawl ships ~64k one-gigabyte `.warc.gz`
  * segments per crawl).
  *
  * Not a reference operator (the reference's storage surface is
  * csv/json/text/bin/jdbc — sparklib Storage.scala); this extends LOAD/
  * STORE to the de-facto pretraining ingest format, reachable from the
  * Pig dialect via `USING WarcStorage()`.
  *
  * Scale design:
  *  - WRITE: one `.warc[.gz]` file per partition, streamed record by
  *    record through the Hadoop `FileSystem` API (local/HDFS/object
  *    stores alike — the session's non-default Hadoop conf entries are
  *    shipped to executors, so credentials and FS bindings survive).
  *    Task-attempt-unique temp name + rename keeps retries idempotent.
  *    With gzip, EVERY RECORD IS ITS OWN GZIP MEMBER (the Common Crawl
  *    convention): concatenated members are a valid `.gz` stream, and a
  *    future offset index can hand single records to readers without
  *    decompressing the segment prefix.
  *  - READ: `binaryFiles` + `PortableDataStream` — one task per
  *    segment (segments are sized ~1 GB precisely so file==task
  *    parallelism works), parsed as a LAZY iterator off the stream:
  *    headers line-by-line, payload length-framed by `Content-Length`,
  *    so peak memory per task is one record, never the file.
  */
object Warc {

  // ---- write ----------------------------------------------------------------

  /** Store `df` as a directory of WARC segments. `uri`/`payload` give
    * WARC-Target-URI and the record body (cast to binary); `date` must
    * render ISO-8601 per record. Record ids are name-based UUIDs of the
    * target URI — deterministic, so a re-written corpus is byte-stable
    * modulo partitioning.
    *
    * `segmentBytes` caps the (compressed) size of one output segment: a
    * writer task ROLLS OVER to a fresh `part-NNNNN-SSSS` file once the
    * current one passes the cap, so read-back parallelism (one task per
    * segment) no longer depends on the INPUT's partitioning — a narrow
    * upstream plan needs no pre-write exchange to produce a readable
    * layout. Default (MaxValue) keeps the historic one-segment-per-
    * partition layout and names. */
  def write(df: DataFrame, path: String, uri: Column, payload: Column,
            date: Column = lit("2026-01-01T00:00:00Z"),
            warcType: String = "resource",
            contentType: String = "text/plain",
            gzip: Boolean = false,
            codec: String = "",
            segmentBytes: Long = Long.MaxValue): Unit = {
    require(segmentBytes > 0, "Warc.write: segmentBytes must be positive")
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    // Configuration is not Serializable: ship the entries and rebuild on
    // executors (keeps object-store creds / FS bindings).
    val confEntries = serializeConf(hconf)
    // codec: "" defers to the gzip flag; "zstd" writes one zstd FRAME per
    // record (zstd-jni ships with Spark) — the same record-seekable
    // layout as the gzip member convention, ~3-5× faster to inflate
    val effCodec =
      if (codec.nonEmpty) codec else if (gzip) "gzip" else "none"
    require(Seq("none", "gzip", "zstd").contains(effCodec),
      s"Warc.write: unknown codec '$effCodec'")
    val ext = effCodec match {
      case "gzip" => ".warc.gz"
      case "zstd" => ".warc.zst"
      case _      => ".warc"
    }
    val rows = df.select(uri.cast("string").as("u"),
                         payload.cast("binary").as("p"),
                         date.cast("string").as("d"))
    val fs0 = hadoopFs(path, hconf)
    val dir = new org.apache.hadoop.fs.Path(path)
    if (fs0.exists(dir)) fs0.delete(dir, true)
    fs0.mkdirs(dir)
    val (wt, ct) = (warcType, contentType)
    val roll = segmentBytes != Long.MaxValue
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val fs = hadoopFs(path, conf)
        val tc = org.apache.spark.TaskContext.get()
        // segment naming: historic part-NNNNN without rollover, a -SSSS
        // sequence suffix with it (both match read()'s extension filter)
        def segPaths(seq: Int) = {
          val base =
            if (roll) f"part-${tc.partitionId()}%05d-$seq%04d"
            else f"part-${tc.partitionId()}%05d"
          (new org.apache.hadoop.fs.Path(path, s"$base$ext"),
           new org.apache.hadoop.fs.Path(path,
             s".$base-${tc.taskAttemptId()}.tmp"))
        }
        var seq = 0
        var (fin, tmp) = segPaths(seq)
        var written = 0L
        // count COMPRESSED bytes as they hit the segment stream — the
        // rollover cap is the on-disk segment size
        def counting(raw: OutputStream): DataOutputStream =
          new DataOutputStream(new FilterOutputStream(raw) {
            override def write(b: Int): Unit = { out.write(b); written += 1 }
            override def write(b: Array[Byte], off: Int, len: Int): Unit = {
              out.write(b, off, len); written += len
            }
          })
        var out = counting(fs.create(tmp, true))
        // retry-idempotent publish: first successful attempt wins
        def publish(): Unit = {
          out.close()
          if (!fs.rename(tmp, fin)) fs.delete(tmp, false)
        }
        // ONE zstd native context per task, reused across records: a
        // per-record ZstdOutputStream re-allocates the native cctx each
        // time, which measured 18× slower than gzip at 500k records
        // (bench_r09_warc_codec_f100.json); ctx.compress emits one
        // complete zstd frame per call — the same record-seekable
        // concatenated-frame layout, at one native call per record
        val zctx = if (effCodec == "zstd")
          new com.github.luben.zstd.ZstdCompressCtx() else null
        try {
          it.foreach { r =>
            if (roll && written >= segmentBytes) {
              // cap passed: seal this segment, start the next
              publish()
              seq += 1
              val np = segPaths(seq); fin = np._1; tmp = np._2
              written = 0L
              out = counting(fs.create(tmp, true))
            }
            val u = r.getString(0)
            val p = if (r.isNullAt(1)) Array.emptyByteArray
                    else r.getAs[Array[Byte]](1)
            val d = r.getString(2)
            effCodec match {
              case "gzip" => // one finished gzip member per record
                val gz = new GZIPOutputStream(nonClosing(out), 64 * 1024)
                writeRecord(gz, wt, ct, u, d, p); gz.finish(); gz.close()
              case "zstd" => // one zstd frame per record
                val buf = new java.io.ByteArrayOutputStream(p.length + 512)
                writeRecord(buf, wt, ct, u, d, p)
                out.write(zctx.compress(buf.toByteArray))
              case _ => writeRecord(out, wt, ct, u, d, p)
            }
          }
          publish()
        } finally {
          if (zctx != null) zctx.close()
          out.close() // no-op when publish() already closed it
        }
        ()
      }
    }
    val ok = fs0.create(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"), true)
    ok.close()
  }

  private def hadoopFs(path: String, conf: org.apache.hadoop.conf.Configuration) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(conf)

  /** Serialize one record. Header values are sanitized of CR/LF (a URI
    * containing either would desync the length-framed stream). */
  private def writeRecord(os: OutputStream, warcType: String, ct: String,
                          uri: String, date: String, p: Array[Byte]): Unit = {
    def clean(s: String) = s.replaceAll("[\r\n]", " ")
    val rid = java.util.UUID.nameUUIDFromBytes(uri.getBytes(UTF_8))
    val hdr = new StringBuilder
    hdr ++= "WARC/1.0\r\n"
    hdr ++= s"WARC-Type: ${clean(warcType)}\r\n"
    hdr ++= s"WARC-Record-ID: <urn:uuid:$rid>\r\n"
    hdr ++= s"WARC-Date: ${clean(date)}\r\n"
    hdr ++= s"WARC-Target-URI: ${clean(uri)}\r\n"
    hdr ++= s"Content-Type: ${clean(ct)}\r\n"
    hdr ++= s"Content-Length: ${p.length}\r\n\r\n"
    os.write(hdr.toString.getBytes(UTF_8))
    os.write(p)
    os.write("\r\n\r\n".getBytes(UTF_8))
  }

  /** An OutputStream view that swallows close() — GZIPOutputStream.close
    * must not take the shared segment stream down with it. */
  private def nonClosing(os: OutputStream): OutputStream =
    new FilterOutputStream(os) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = out.flush()
    }

  // ---- read -----------------------------------------------------------------

  /** Load a WARC directory (or glob) as a DataFrame of [[WarcRecord]].
    * Gzip is detected per file by suffix; Java's GZIPInputStream reads
    * the concatenated per-record members as one logical stream. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // explicit driver-side segment listing: the input may hold sidecars
    // (_index, _SUCCESS) that a bare directory input would trip over,
    // and a 64k-segment listing is trivially driver-sized
    val fs = hadoopFs(path, spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val segs =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(st => st.isFile && {
          val n = st.getPath.getName
          n.endsWith(".warc") || n.endsWith(".warc.gz") ||
            n.endsWith(".warc.zst")
        }).map(_.getPath.toString)
      else Array(path)
    if (segs.isEmpty) return spark.emptyDataset[WarcRecord].toDF()
    val rdd = spark.sparkContext.binaryFiles(segs.mkString(","))
      .flatMap { case (name, pds) => recordIterator(name, pds) }
    spark.createDataset(rdd).toDF()
  }

  /** Lazy per-record iterator over one segment stream. */
  private[sources] def recordIterator(name: String,
      pds: PortableDataStream): Iterator[WarcRecord] =
    recordIterator(name, pds.open())

  /** Close `c` when the running task completes — a downstream `limit`
    * can abandon an iterator mid-stream, and without this the segment
    * stream would leak until executor GC. No-op off-task (tests). */
  private def closeOnTaskEnd(c: java.io.Closeable): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) {
      tc.addTaskCompletionListener[Unit] { _ =>
        try c.close() catch { case _: java.io.IOException => () }
      }
      ()
    }
  }

  private[sources] def recordIterator(name: String,
      raw: InputStream): Iterator[WarcRecord] = {
    closeOnTaskEnd(raw)
    val decoded: InputStream =
      if (name.endsWith(".gz")) new GZIPInputStream(raw, 64 * 1024)
      else if (name.endsWith(".zst")) {
        // continuous: read ACROSS the per-record frames as one stream
        val z = new com.github.luben.zstd.ZstdInputStream(raw)
        z.setContinuous(true)
        z
      } else raw
    val in: InputStream = new BufferedInputStream(decoded, 64 * 1024)
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false
      private def advance(): Unit = {
        if (!done && nextRec == null) {
          nextRec = parseRecord(in)
          if (nextRec == null) { done = true; in.close() }
        }
      }
      def hasNext: Boolean = { advance(); nextRec != null }
      def next(): WarcRecord = {
        advance()
        if (nextRec == null) throw new NoSuchElementException("WARC EOF")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Parse one record off the stream; null at clean EOF. Tolerates any
    * number of blank lines between records (the spec's two CRLF record
    * separators, but also hand-edited files). */
  private[sources] def parseRecord(in: InputStream): WarcRecord = {
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return null
    if (!line.startsWith("WARC/"))
      sys.error(s"WARC: expected version line, got '$line'")
    var (typ, rid, uri, date, ct) = ("", "", "", "", "")
    var len = -1L
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      val i = h.indexOf(':')
      if (i > 0) {
        val k = h.substring(0, i).trim.toLowerCase
        val v = h.substring(i + 1).trim
        k match {
          case "warc-type"       => typ = v
          case "warc-record-id"  => rid = v.stripPrefix("<").stripSuffix(">")
          case "warc-target-uri" => uri = v
          case "warc-date"       => date = v
          case "content-type"    => ct = v
          case "content-length"  => len = v.toLong
          case _                 => // ignore unmodeled headers
        }
      }
      h = readLine(in)
    }
    if (len < 0) sys.error("WARC: record without Content-Length")
    val p = new Array[Byte](len.toInt)
    var off = 0
    while (off < p.length) {
      val n = in.read(p, off, p.length - off)
      if (n < 0) throw new EOFException(
        s"WARC: payload truncated at $off of $len")
      off += n
    }
    WarcRecord(typ, rid, uri, date, ct, p)
  }

  // ---- streaming ingestion --------------------------------------------------

  /** STREAMING WARC ingestion: each segment file that LANDS under `dir`
    * becomes a micro-batch of parsed records — the shape of a live
    * crawl feeding the curation pipeline incrementally (new `.warc.gz`
    * uploads are discovered by the file-stream source; every downstream
    * streaming operator — dedup, heavy hitters, profile, CEP —
    * composes on top). Built on the `binaryFile` file-stream source, so
    * a task holds ONE segment's bytes; size segments accordingly (the
    * ~1 GB crawl convention). */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val binSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binSchema)
      .option("pathGlobFilter", "*.warc*")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) =>
        recordIterator(name, new java.io.ByteArrayInputStream(bytes)) }
      .toDF()
  }

  // ---- HTTP response framing (Common Crawl 'response' records) ------------
  /** Wrap a payload as the HTTP/1.1 response block that lives inside a
    * crawl's `response`-type records: status line + minimal headers +
    * CRLFCRLF + body. Column-level so it composes straight into
    * [[write]]/[[writeIndexed]] payloads. */
  def httpResponse(body: Column, status: Int = 200,
                   contentType: String = "text/html"): Column =
    concat(
      lit(s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
        "Content-Length: "),
      octet_length(body).cast("string"), lit("\r\n\r\n"), body)

  /** The body after the first blank line — the inverse of
    * [[httpResponse]]; payloads without HTTP framing pass through
    * whole. (Headers never contain a blank line, so a body carrying
    * its own CRLFCRLF is safe.) */
  def httpBody(payload: Column): Column = {
    val s = payload.cast("string")
    val at = instr(s, "\r\n\r\n")
    when(s.startsWith("HTTP/") && at > 0,
      s.substr(at + 4, length(s))).otherwise(s)
  }

  /** Status code of an HTTP-framed payload (null when unframed). */
  def httpStatus(payload: Column): Column =
    nullif(regexp_extract(payload.cast("string"),
      "^HTTP/[0-9.]+ ([0-9]+)", 1), lit("")).cast("int")

  /** A response header's value (first match, case-insensitive; null
    * when absent). `name` must be a literal header token. */
  def httpHeader(payload: Column, name: String): Column = {
    require(name.matches("[A-Za-z0-9-]+"), s"bad header token: $name")
    nullif(regexp_extract(payload.cast("string"),
      s"(?im)^$name:\\s*([^\\r\\n]*)", 1), lit(""))
  }

  // ---- offset index + record seek ------------------------------------------

  /** Like [[write]] but gzip-forced (member-per-record is what makes
    * slices independently decompressible) and with a SIDECAR OFFSET
    * INDEX: `path/_index` parquet of `(segment, target_uri, offset,
    * length)` — the compressed byte extent of every record's gzip
    * member. [[readIndexed]] then serves POINT READS out of a corpus
    * without scanning segments: filter the (columnar, predicate-pushed)
    * index, seek each segment stream to the member, inflate just that
    * record. At 100 TB this is the difference between "fetch these 10k
    * documents" costing 10k seeks and costing a full corpus scan. */
  def writeIndexed(df: DataFrame, path: String, uri: Column,
                   payload: Column,
                   date: Column = lit("2026-01-01T00:00:00Z"),
                   warcType: String = "resource",
                   contentType: String = "text/plain"): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val confEntries = serializeConf(hconf)
    val rows = df.select(uri.cast("string").as("u"),
                         payload.cast("binary").as("p"),
                         date.cast("string").as("d"))
    val fs0 = hadoopFs(path, hconf)
    val dir = new org.apache.hadoop.fs.Path(path)
    if (fs0.exists(dir)) fs0.delete(dir, true)
    fs0.mkdirs(dir)
    val (wt, ct) = (warcType, contentType)
    import spark.implicits._
    val idx = rows.rdd.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val fs = hadoopFs(path, conf)
        val tc = org.apache.spark.TaskContext.get()
        val segName = f"part-${tc.partitionId()}%05d.warc.gz"
        val fin = new org.apache.hadoop.fs.Path(path, segName)
        val tmp = new org.apache.hadoop.fs.Path(path,
          f".part-${tc.partitionId()}%05d-${tc.taskAttemptId()}.tmp")
        val raw = fs.create(tmp, true)
        var written = 0L
        val counting = new FilterOutputStream(raw) {
          override def write(b: Int): Unit = { out.write(b); written += 1 }
          override def write(b: Array[Byte], off: Int, len: Int): Unit = {
            out.write(b, off, len); written += len
          }
        }
        val entries = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long, Long)]
        it.foreach { r =>
          val u = r.getString(0)
          val p = if (r.isNullAt(1)) Array.emptyByteArray
                  else r.getAs[Array[Byte]](1)
          val d = r.getString(2)
          val start = written
          val gz = new GZIPOutputStream(nonClosing(counting), 64 * 1024)
          writeRecord(gz, wt, ct, u, d, p); gz.finish(); gz.close()
          entries += ((segName, u, start, written - start))
        }
        counting.close()
        if (!fs.rename(tmp, fin)) fs.delete(tmp, false)
        entries.iterator
      }
    }.toDF("segment", "target_uri", "offset", "length")
    // writing the index IS the action that drives the segment writes
    idx.write.mode("overwrite").parquet(s"$path/_index")
    val ok = fs0.create(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"), true)
    ok.close()
  }

  /** Point-read records whose INDEX rows satisfy `predicate` (applied
    * to the `_index` columns — `target_uri` pushes down to the parquet
    * scan). Entries are clustered per segment and visited in offset
    * order, so each task seeks forward through one open stream. */
  def readIndexed(spark: SparkSession, path: String,
                  predicate: Column): DataFrame = {
    import spark.implicits._
    val confEntries = serializeConf(spark.sparkContext.hadoopConfiguration)
    val hits = spark.read.parquet(s"$path/_index").where(predicate)
      .select(col("segment"), col("offset"), col("length"))
      .as[(String, Long, Long)]
      .repartition(col("segment"))
      .sortWithinPartitions(col("segment"), col("offset"))
    hits.mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confEntries.foreach { case (k, v) => conf.set(k, v) }
      val fs = hadoopFs(path, conf)
      new Iterator[WarcRecord] {
        private var openSeg: String = null
        private var in: org.apache.hadoop.fs.FSDataInputStream = null
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && in != null) { in.close(); in = null } // last segment
          h
        }
        def next(): WarcRecord = {
          val (seg, off, len) = it.next()
          if (seg != openSeg) {
            if (in != null) in.close()
            in = fs.open(new org.apache.hadoop.fs.Path(path, seg))
            closeOnTaskEnd(in)
            openSeg = seg
          }
          in.seek(off)
          val buf = new Array[Byte](len.toInt)
          in.readFully(buf)
          val rec = parseRecord(new BufferedInputStream(
            new GZIPInputStream(new java.io.ByteArrayInputStream(buf)), 8192))
          if (rec == null) throw new EOFException(
            s"WARC index points at empty member: $seg@$off+$len")
          rec
        }
      }
    }.toDF()
  }

  private def serializeConf(hconf: org.apache.hadoop.conf.Configuration)
      : Seq[(String, String)] = {
    val it = hconf.iterator(); val b = Seq.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  /** Read one CRLF/LF-terminated UTF-8 header line; null at EOF before
    * any byte. Headers are length-unframed, so this is the only
    * byte-at-a-time loop — it runs over the BufferedInputStream. */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(80)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { if (b != '\r') buf.write(b); b = in.read() }
    new String(buf.toByteArray, UTF_8)
  }
}
