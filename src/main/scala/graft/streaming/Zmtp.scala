package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM ZMTP 3.0 wire codec (the ZeroMQ Message Transport Protocol,
  * public spec rfc.zeromq.org/spec/23): greeting, frame, NULL-mechanism
  * READY handshake and PUB/SUB subscription semantics. This is the
  * transport half of the reference's zmq SOCKET_READ (reference:
  * op/SocketRead.scala + sparklib ZmqStream): [[Streams.zmqFrames]]
  * already implements the dataflow half (topic filter + frame split) over
  * line-TCP, and this codec makes the byte protocol itself testable
  * without a native libzmq — a live transport is the composition of the
  * two over a plain TCP socket.
  *
  * All state lives in [[Zmtp.Decoder]], one instance per connection —
  * nothing here touches Spark; executors use it inside a socket source.
  */
object Zmtp {

  /** Parsed 64-octet greeting. */
  final case class Greeting(major: Int, minor: Int, mechanism: String,
                            asServer: Boolean)

  /** One wire frame: `more` chains multipart messages, `command` marks
    * protocol commands (READY, SUBSCRIBE, PING...). */
  final case class Frame(body: Array[Byte], more: Boolean = false,
                         command: Boolean = false)

  /** Decoder output events. */
  sealed trait Event
  final case class GreetingEvent(greeting: Greeting) extends Event
  /** A command frame, split into name + NULL-metadata properties. */
  final case class CommandEvent(name: String,
                                props: Map[String, String]) extends Event
  /** A complete (possibly multipart) data message. */
  final case class MessageEvent(parts: Seq[Array[Byte]]) extends Event

  // ---- greeting (spec §greeting: 10+2+20+1+31 = 64 octets) -----------------
  def greeting(mechanism: String = "NULL", asServer: Boolean = false,
               minor: Int = 0): Array[Byte] = {
    require(mechanism.length <= 20, s"mechanism too long: $mechanism")
    val b = new Array[Byte](64)
    b(0) = 0xFF.toByte // signature: FF, 8 padding octets, 7F
    b(9) = 0x7F
    b(10) = 3 // version-major
    b(11) = minor.toByte
    val m = mechanism.getBytes(UTF_8)
    System.arraycopy(m, 0, b, 12, m.length) // zero-padded to 20
    b(32) = if (asServer) 1 else 0
    b // filler 33..63 stays zero
  }

  def parseGreeting(b: Array[Byte]): Either[String, Greeting] = {
    if (b.length < 64) Left(s"greeting needs 64 octets, got ${b.length}")
    else if (b(0) != 0xFF.toByte || b(9) != 0x7F)
      Left("bad signature (expected FF ........ 7F)")
    else if (b(10) != 3) Left(s"unsupported ZMTP major version ${b(10)}")
    else {
      val mech = new String(b.slice(12, 32).takeWhile(_ != 0), UTF_8)
      Right(Greeting(b(10), b(11), mech, b(32) == 1))
    }
  }

  // ---- frames (spec §framing: flags octet, size, body) ---------------------
  private val FlagMore = 0x01
  private val FlagLong = 0x02
  private val FlagCommand = 0x04

  def encodeFrame(f: Frame): Array[Byte] = {
    val flags = (if (f.more) FlagMore else 0) |
      (if (f.command) FlagCommand else 0)
    if (f.body.length <= 0xFF) {
      val out = new Array[Byte](2 + f.body.length)
      out(0) = flags.toByte
      out(1) = f.body.length.toByte
      System.arraycopy(f.body, 0, out, 2, f.body.length)
      out
    } else {
      val out = new Array[Byte](9 + f.body.length)
      out(0) = (flags | FlagLong).toByte
      var n = f.body.length.toLong
      var i = 8
      while (i >= 1) { out(i) = (n & 0xFF).toByte; n >>= 8; i -= 1 }
      System.arraycopy(f.body, 0, out, 9, f.body.length)
      out
    }
  }

  // ---- NULL-mechanism commands (spec §NULL: READY + metadata) --------------
  /** Encode a command frame: 1-octet name length, name, then metadata
    * properties (1-octet name length, name, 4-octet BE value length,
    * value). READY's canonical property is Socket-Type. */
  def command(name: String, props: Seq[(String, String)]): Frame = {
    val out = new java.io.ByteArrayOutputStream()
    val n = name.getBytes(UTF_8)
    out.write(n.length); out.write(n)
    props.foreach { case (k, v) =>
      val kb = k.getBytes(UTF_8); val vb = v.getBytes(UTF_8)
      out.write(kb.length); out.write(kb)
      out.write((vb.length >>> 24) & 0xFF); out.write((vb.length >>> 16) & 0xFF)
      out.write((vb.length >>> 8) & 0xFF); out.write(vb.length & 0xFF)
      out.write(vb)
    }
    Frame(out.toByteArray, command = true)
  }

  def ready(socketType: String): Frame =
    command("READY", Seq("Socket-Type" -> socketType))

  /** Malformed input from a peer is a PROTOCOL error, not an index
    * crash: every length is bounds-checked (and the 4-octet value length
    * sign-checked) before it is read. */
  private def bad(msg: String): Nothing =
    throw new IllegalStateException(s"malformed ZMTP command: $msg")

  private def parseCommand(body: Array[Byte]): CommandEvent = {
    if (body.isEmpty) bad("empty command frame")
    val nameLen = body(0) & 0xFF
    if (1 + nameLen > body.length)
      bad(s"command name length $nameLen exceeds body ${body.length}")
    val name = new String(body, 1, nameLen, UTF_8)
    var i = 1 + nameLen
    val props = Map.newBuilder[String, String]
    while (i < body.length) {
      val kLen = body(i) & 0xFF
      if (i + 1 + kLen + 4 > body.length)
        bad(s"property header at offset $i overruns body ${body.length}")
      val k = new String(body, i + 1, kLen, UTF_8)
      i += 1 + kLen
      val vLen = ((body(i) & 0xFF) << 24) | ((body(i + 1) & 0xFF) << 16) |
        ((body(i + 2) & 0xFF) << 8) | (body(i + 3) & 0xFF)
      // compare as `vLen > remaining`, never `i + 4 + vLen > length`: a
      // huge positive vLen overflows the Int sum and slips past the guard
      if (vLen < 0 || vLen > body.length - i - 4)
        bad(s"property value length $vLen at offset $i overruns body ${body.length}")
      val v = new String(body, i + 4, vLen, UTF_8)
      i += 4 + vLen
      props += k -> v
    }
    CommandEvent(name, props.result())
  }

  // ---- PUB/SUB subscriptions (spec §PUB-SUB: 0x01+topic / 0x00+topic) ------
  def subscribe(topic: String): Frame =
    Frame(1.toByte +: topic.getBytes(UTF_8))
  def cancel(topic: String): Frame =
    Frame(0.toByte +: topic.getBytes(UTF_8))

  /** PUB-side subscription table: prefix matching per the spec ("" matches
    * everything). Feed it the SUB peer's subscribe/cancel messages.
    * REFCOUNTED like libzmq's trie: N subscribes to the same prefix need
    * N cancels before it deactivates (two components subscribing and one
    * cancelling must not silently filter the other's messages). */
  final class Subscriptions {
    private var prefixes = Map.empty[String, Int]
    def feed(msg: Array[Byte]): Unit =
      if (msg.nonEmpty) {
        val topic = new String(msg, 1, msg.length - 1, UTF_8)
        if (msg(0) == 1)
          prefixes = prefixes.updated(topic, prefixes.getOrElse(topic, 0) + 1)
        else prefixes.get(topic).foreach { n =>
          if (n <= 1) prefixes -= topic
          else prefixes = prefixes.updated(topic, n - 1)
        }
      }
    def accepts(topic: String): Boolean =
      prefixes.keysIterator.exists(topic.startsWith)
    def active: Set[String] = prefixes.keySet
  }

  /** Incremental connection decoder: feed arbitrarily fragmented bytes,
    * get complete protocol events. The greeting is consumed first;
    * multipart messages accumulate until the final (MORE=0) frame.
    *
    * `maxMessageBytes` bounds what an untrusted peer can make this side
    * buffer — both a single frame's declared size and the accumulated
    * multipart total. Exceeding it is a protocol error (ZMQ itself has
    * the same guard as ZMQ_MAXMSGSIZE). */
  final class Decoder(maxMessageBytes: Int = 64 << 20) {
    // growable byte buffer with a consume offset: appends are amortized
    // O(1) (no per-feed whole-buffer copy — a large frame dripping in
    // over many reads must not cost O(frame) PER read), and the consumed
    // prefix compacts at most once per feed, only after frames completed
    private var buf = new Array[Byte](256)
    private var end = 0 // filled length
    private var pos = 0 // consumed offset
    private var greeted = false
    private var parts = Vector.empty[Array[Byte]]
    private var partBytes = 0L

    private def avail: Int = end - pos

    def feed(bytes: Array[Byte]): Seq[Event] = {
      if (end + bytes.length > buf.length) {
        val grown = new Array[Byte](
          math.max(buf.length * 2, end + bytes.length))
        System.arraycopy(buf, 0, grown, 0, end)
        buf = grown
      }
      System.arraycopy(bytes, 0, buf, end, bytes.length)
      end += bytes.length
      val events = Seq.newBuilder[Event]
      var progress = true
      while (progress) {
        progress = false
        if (!greeted) {
          if (avail >= 64) {
            parseGreeting(buf.slice(pos, pos + 64)) match {
              case Left(err) => throw new IllegalStateException(err)
              case Right(g) => events += GreetingEvent(g)
            }
            pos += 64
            greeted = true
            progress = true
          }
        } else if (avail >= 2) {
          val flags = buf(pos) & 0xFF
          val long = (flags & FlagLong) != 0
          val headLen = if (long) 9 else 2
          if (avail >= headLen) {
            val size =
              if (long) {
                var n = 0L
                var i = 1
                while (i <= 8) { n = (n << 8) | (buf(pos + i) & 0xFF); i += 1 }
                // the sign check matters: a negative declared size would
                // make headLen + size <= headLen and the loop would spin
                // forever consuming nothing (or walk pos negative)
                if (n < 0 || n > maxMessageBytes)
                  throw new IllegalStateException(
                    s"ZMTP frame size $n outside [0, $maxMessageBytes]")
                n.toInt
              } else buf(pos + 1) & 0xFF
            if (avail >= headLen + size) {
              val body = buf.slice(pos + headLen, pos + headLen + size)
              pos += headLen + size
              progress = true
              if ((flags & FlagCommand) != 0) events += parseCommand(body)
              else if ((flags & FlagMore) != 0) {
                partBytes += body.length
                if (partBytes > maxMessageBytes)
                  throw new IllegalStateException(
                    s"multipart message exceeds $maxMessageBytes bytes")
                parts :+= body
              } else {
                events += MessageEvent(parts :+ body)
                parts = Vector.empty
                partBytes = 0L
              }
            }
          }
        }
      }
      if (pos > 0) { // compact the consumed prefix
        System.arraycopy(buf, pos, buf, 0, end - pos)
        end -= pos
        pos = 0
      }
      events.result()
    }
  }

  /** Bridge a decoded PUB/SUB multipart message into the "topic payload"
    * line shape [[Streams.zmqFrames]] consumes — the seam where this
    * codec plugs into the existing streaming dataflow. */
  def messageToLine(parts: Seq[Array[Byte]]): String =
    parts.map(new String(_, UTF_8)).mkString(" ")
}
