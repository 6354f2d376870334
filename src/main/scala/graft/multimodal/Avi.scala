package graft.multimodal

/** Pure-JVM AVI (RIFF) container parser for MJPEG video payloads.
  *
  * Motion-JPEG is the one mainstream video coding the JDK can decode
  * without native codecs: the AVI container is a plain RIFF chunk tree
  * and every frame chunk is a standalone JPEG that `javax.imageio`
  * reads. H.264/VP9 remain out of JVM reach — those payloads still
  * route to the documented deterministic stand-in — but an MJPEG AVI
  * (the classic capture/surveillance/dataset interchange format) now
  * decodes for real.
  *
  * Layout parsed here (reference: the public MSDN RIFF/AVI spec):
  * `RIFF <size> AVI ` containing `LIST hdrl` (with the `avih` main
  * header: dwMicroSecPerFrame @0, dwTotalFrames @16, dwWidth @32,
  * dwHeight @36) and `LIST movi` whose `##dc`/`##db` sub-chunks are the
  * video frames (MJPEG: JPEG bytes). All sizes little-endian; chunks
  * pad to even offsets. Truncated/malformed structures stop the walk
  * and yield what was parsed so far — one corrupt tail must not kill a
  * distributed decode job.
  */
object Avi {

  /** avih main header fields graft uses. */
  final case class Header(microSecPerFrame: Long, totalFrames: Long,
                          width: Int, height: Int)

  def isAvi(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

  private def u32(p: Array[Byte], i: Int): Long =
    if (i + 4 > p.length) -1L
    else (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)

  private def fourcc(p: Array[Byte], i: Int): String =
    if (i + 4 > p.length) ""
    else new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** A video frame chunk: `##dc` or `##db` (compressed / uncompressed
    * DIB). Audio is `##wb`, index `idx1` — skipped. */
  private def isVideoFrameId(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      (id.substring(2) == "dc" || id.substring(2) == "db")

  /** Parse the container: (avih header if present, video frame spans as
    * (offset, length) into the payload). */
  def parse(p: Array[Byte]): (Option[Header], IndexedSeq[(Int, Int)]) = {
    if (!isAvi(p)) return (None, Vector.empty)
    var header: Option[Header] = None
    val frames = Vector.newBuilder[(Int, Int)]

    // walk sub-chunks of [from, until); LIST recurses, avih fills the
    // header, ##dc/##db record frame spans
    def walk(from: Int, until: Int): Unit = {
      var i = from
      while (i + 8 <= until && i + 8 <= p.length) {
        val id = fourcc(p, i)
        val size = u32(p, i + 4)
        if (size < 0 || id.isEmpty) return // truncated header: stop
        val dataStart = i + 8
        val dataEnd = dataStart + size
        if (dataEnd > p.length || dataEnd > until) return // truncated body
        if (id == "LIST" && size >= 4) {
          // list type occupies the first 4 data bytes
          walk(dataStart + 4, dataEnd.toInt)
        } else if (id == "avih" && size >= 40) {
          header = Some(Header(
            microSecPerFrame = u32(p, dataStart),
            totalFrames = u32(p, dataStart + 16),
            width = u32(p, dataStart + 32).toInt,
            height = u32(p, dataStart + 36).toInt))
        } else if (isVideoFrameId(id) && size > 0) {
          frames += ((dataStart, size.toInt))
        }
        // chunks pad to even sizes
        i = (dataEnd + (size % 2)).toInt
      }
    }
    walk(12, p.length)
    (header, frames.result())
  }

  /** Copy out frame `idx`'s bytes (a standalone JPEG for MJPEG). */
  def frameBytes(p: Array[Byte], span: (Int, Int)): Array[Byte] =
    java.util.Arrays.copyOfRange(p, span._1, span._1 + span._2)

  // ---- writer (test/fixture support) ---------------------------------------
  /** Build a minimal MJPEG AVI around pre-encoded JPEG frames — enough
    * container for [[parse]] and any standard AVI reader: RIFF(AVI ) →
    * LIST(hdrl: avih) → LIST(movi: 00dc…). Used by specs to fabricate
    * real video payloads without shipping binary fixtures. */
  def build(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
            microSecPerFrame: Long = 33333L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }
    val avih = le32(microSecPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(jpegFrames.size) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ Array.fill(16)(0.toByte)
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ chunk("avih", avih))
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      jpegFrames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }
}
