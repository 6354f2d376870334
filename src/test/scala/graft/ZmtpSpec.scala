package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import graft.streaming.Zmtp
import graft.streaming.Zmtp._

/** ZMTP 3.0 codec vs the spec's canonical byte layouts
  * (rfc.zeromq.org/spec/23) — no Spark, no sockets, no native libzmq.
  */
class ZmtpSpec extends AnyFunSuite {

  test("greeting emits the spec's exact 64-octet layout for NULL") {
    val g = Zmtp.greeting()
    assert(g.length == 64)
    // signature: FF, 8 padding, 7F
    assert(g(0) == 0xFF.toByte && g.slice(1, 9).forall(_ == 0) && g(9) == 0x7F)
    // version 3.0
    assert(g(10) == 3 && g(11) == 0)
    // mechanism "NULL" zero-padded to 20 octets
    assert(g.slice(12, 32).toSeq ==
      ("NULL".getBytes(UTF_8) ++ Array.fill[Byte](16)(0)).toSeq)
    // as-server 0, filler zero
    assert(g(32) == 0 && g.slice(33, 64).forall(_ == 0))
    assert(Zmtp.parseGreeting(g) == Right(Greeting(3, 0, "NULL", false)))
  }

  test("greeting round-trips mechanism and as-server; bad bytes rejected") {
    val g = Zmtp.greeting("CURVE", asServer = true, minor = 1)
    assert(Zmtp.parseGreeting(g) == Right(Greeting(3, 1, "CURVE", true)))
    assert(Zmtp.parseGreeting(Array.fill[Byte](64)(0)).isLeft)
    assert(Zmtp.parseGreeting(Zmtp.greeting().take(10)).isLeft)
    val wrongVer = Zmtp.greeting(); wrongVer(10) = 2
    assert(Zmtp.parseGreeting(wrongVer).isLeft)
  }

  test("READY(SUB) encodes the spec's command-frame bytes exactly") {
    val bytes = Zmtp.encodeFrame(Zmtp.ready("SUB"))
    val expected: Array[Byte] =
      Array[Byte](0x04, 0x19, 0x05) ++ "READY".getBytes(UTF_8) ++
        Array[Byte](0x0B) ++ "Socket-Type".getBytes(UTF_8) ++
        Array[Byte](0, 0, 0, 3) ++ "SUB".getBytes(UTF_8)
    assert(bytes.toSeq == expected.toSeq)
  }

  test("long frames use the 8-octet big-endian size form") {
    val body = Array.fill[Byte](300)('x'.toByte)
    val enc = Zmtp.encodeFrame(Frame(body))
    assert(enc(0) == 0x02) // LONG flag only
    assert(enc.slice(1, 9).toSeq ==
      Seq[Byte](0, 0, 0, 0, 0, 0, 0x01, 0x2C)) // 300 = 0x012C
    assert(enc.length == 9 + 300)
    // short frame boundary: 255 stays short
    assert(Zmtp.encodeFrame(Frame(Array.fill[Byte](255)(1)))(0) == 0x00)
  }

  test("decoder replays a full PUB-side exchange from fragmented bytes") {
    // recorded exchange: greeting, READY(SUB), subscribe("tick."),
    // then a 2-part message tick.eur | 1.09
    val wire = Zmtp.greeting() ++
      Zmtp.encodeFrame(Zmtp.ready("SUB")) ++
      Zmtp.encodeFrame(Zmtp.subscribe("tick.")) ++
      Zmtp.encodeFrame(Frame("tick.eur".getBytes(UTF_8), more = true)) ++
      Zmtp.encodeFrame(Frame("1.09".getBytes(UTF_8)))
    // feed in adversarial fragment sizes (1..7 bytes, fixed seed)
    val rnd = new scala.util.Random(42)
    val dec = new Zmtp.Decoder
    val events = scala.collection.mutable.ArrayBuffer.empty[Event]
    var i = 0
    while (i < wire.length) {
      val n = math.min(1 + rnd.nextInt(7), wire.length - i)
      events ++= dec.feed(wire.slice(i, i + n))
      i += n
    }
    assert(events.length == 4)
    assert(events(0) == GreetingEvent(Greeting(3, 0, "NULL", false)))
    assert(events(1) == CommandEvent("READY", Map("Socket-Type" -> "SUB")))
    val sub = events(2).asInstanceOf[MessageEvent]
    assert(sub.parts.length == 1 && sub.parts.head.head == 1)
    val msg = events(3).asInstanceOf[MessageEvent]
    assert(msg.parts.map(new String(_, UTF_8)) == Seq("tick.eur", "1.09"))
    assert(Zmtp.messageToLine(msg.parts) == "tick.eur 1.09")
  }

  test("malformed command frames fail as protocol errors, not index crashes") {
    def decodeAfterGreeting(frame: Array[Byte]) = {
      val dec = new Zmtp.Decoder
      dec.feed(Zmtp.greeting())
      dec.feed(frame)
    }
    // zero-length command body
    val e1 = intercept[IllegalStateException] {
      decodeAfterGreeting(Array[Byte](0x04, 0x00))
    }
    assert(e1.getMessage.contains("malformed ZMTP command"))
    // command name length overruns the body
    val e2 = intercept[IllegalStateException] {
      decodeAfterGreeting(Array[Byte](0x04, 0x02, 0x7F, 'R'))
    }
    assert(e2.getMessage.contains("malformed ZMTP command"))
    // property value length with the sign bit set (would be negative)
    val body = Array[Byte](0x01, 'X', 0x01, 'k',
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    val e3 = intercept[IllegalStateException] {
      decodeAfterGreeting(Array[Byte](0x04, body.length.toByte) ++ body)
    }
    assert(e3.getMessage.contains("malformed ZMTP command"))
  }

  test("adversarial frame sizes are protocol errors, not spins or crashes") {
    def afterGreeting(bytes: Array[Byte]) = {
      val dec = new Zmtp.Decoder
      dec.feed(Zmtp.greeting())
      dec.feed(bytes)
    }
    // negative declared long-frame size (sign bit set): headLen + size
    // would stop consuming and spin feed() forever without the guard
    val neg = intercept[IllegalStateException] {
      afterGreeting(Array[Byte](0x02, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
        0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xF7.toByte))
    }
    assert(neg.getMessage.contains("outside"))
    // a 2 GB declared size must be rejected up-front, not buffered
    val huge = intercept[IllegalStateException] {
      afterGreeting(Array[Byte](0x02, 0, 0, 0, 0, 0x7F, 0, 0, 0))
    }
    assert(huge.getMessage.contains("outside"))
    // unbounded multipart accumulation is capped too
    val dec = new Zmtp.Decoder(maxMessageBytes = 1024)
    dec.feed(Zmtp.greeting())
    val part = Zmtp.encodeFrame(Frame(Array.fill[Byte](200)(1), more = true))
    val acc = intercept[IllegalStateException] {
      (1 to 10).foreach(_ => dec.feed(part))
    }
    assert(acc.getMessage.contains("multipart"))
    // property value length that overflows i+4+vLen stays a protocol error
    val body = Array[Byte](0x01, 'X', 0x01, 'k',
      0x7F, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    val ovf = intercept[IllegalStateException] {
      afterGreeting(Array[Byte](0x04, body.length.toByte) ++ body)
    }
    assert(ovf.getMessage.contains("malformed ZMTP command"))
  }

  test("decoder reassembles a large long-frame dripped in small reads") {
    val payload = Array.tabulate[Byte](100000)(i => (i % 251).toByte)
    val wire = Zmtp.greeting() ++ Zmtp.encodeFrame(Frame(payload))
    val dec = new Zmtp.Decoder
    val events = scala.collection.mutable.ArrayBuffer.empty[Event]
    wire.grouped(1024).foreach(chunk => events ++= dec.feed(chunk))
    assert(events.length == 2)
    assert(events(1).asInstanceOf[MessageEvent].parts.head.toSeq ==
      payload.toSeq)
  }

  test("subscription table: prefix match, cancel, empty-prefix wildcard") {
    val subs = new Zmtp.Subscriptions
    subs.feed(Zmtp.subscribe("tick.").body)
    assert(subs.accepts("tick.eur") && !subs.accepts("trade.eur"))
    subs.feed(Zmtp.cancel("tick.").body)
    assert(!subs.accepts("tick.eur") && subs.active.isEmpty)
    subs.feed(Zmtp.subscribe("").body) // "" = all topics (spec)
    assert(subs.accepts("anything"))
  }

  test("subscriptions are refcounted like libzmq: N subscribes need N cancels") {
    val subs = new Zmtp.Subscriptions
    subs.feed(Zmtp.subscribe("a").body)
    subs.feed(Zmtp.subscribe("a").body) // second component, same prefix
    subs.feed(Zmtp.cancel("a").body)    // one cancels...
    assert(subs.accepts("abc"))         // ...the other still subscribed
    subs.feed(Zmtp.cancel("a").body)
    assert(!subs.accepts("abc") && subs.active.isEmpty)
    subs.feed(Zmtp.cancel("a").body) // over-cancel is a no-op
    assert(subs.active.isEmpty)
  }

  test("relay performs the live SUB handshake against a ZMTP PUB server " +
      "and re-serves decoded messages as lines") {
    import graft.streaming.ZmtpRelay
    import java.util.concurrent.{CountDownLatch, LinkedBlockingQueue, TimeUnit}
    val pubReceived = new LinkedBlockingQueue[Event]()
    // gate: the PUB publishes only after the test's line-reader client is
    // connected to the relay (otherwise the broadcast finds no client yet)
    val publishGate = new CountDownLatch(1)
    val server = new java.net.ServerSocket(0)
    val pub = new Thread(() => {
      val s = server.accept()
      val out = s.getOutputStream
      // PUB side of the NULL handshake
      out.write(Zmtp.greeting())
      out.write(Zmtp.encodeFrame(Zmtp.ready("PUB")))
      out.flush()
      // read + decode the SUB peer's greeting, READY and subscription
      val dec = new Zmtp.Decoder
      val buf = new Array[Byte](4096)
      val in = s.getInputStream
      var need = 3 // greeting + READY + subscribe message
      while (need > 0) {
        val n = in.read(buf)
        assert(n >= 0, "SUB peer hung up mid-handshake")
        dec.feed(java.util.Arrays.copyOf(buf, n)).foreach { e =>
          pubReceived.put(e); need -= 1
        }
      }
      // publish: one multipart on the subscribed topic, one off-topic
      assert(publishGate.await(15, TimeUnit.SECONDS))
      out.write(Zmtp.encodeFrame(Frame("tick.eur".getBytes(UTF_8), more = true)))
      out.write(Zmtp.encodeFrame(Frame("1.09".getBytes(UTF_8))))
      out.write(Zmtp.encodeFrame(Frame("trade.usd done".getBytes(UTF_8))))
      out.flush()
      Thread.sleep(3000)
      s.close(); server.close()
    })
    pub.setDaemon(true); pub.start()

    val relay = ZmtpRelay.start("localhost", server.getLocalPort,
      topics = Seq("tick."))
    try {
      // the PUB server saw a correct SUB handshake
      assert(pubReceived.take() ==
        GreetingEvent(Greeting(3, 0, "NULL", false)))
      assert(pubReceived.take() ==
        CommandEvent("READY", Map("Socket-Type" -> "SUB")))
      val sub = pubReceived.take().asInstanceOf[MessageEvent]
      assert(sub.parts.head.toSeq ==
        (1.toByte +: "tick.".getBytes(UTF_8)).toSeq)
      // a plain TCP client on the relay port reads decoded lines
      val client = new java.net.Socket("localhost", relay.localPort)
      client.setSoTimeout(10000)
      Thread.sleep(500) // let the acceptor register the client
      publishGate.countDown()
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(client.getInputStream, UTF_8))
      val lines = Seq(reader.readLine(), reader.readLine())
      client.close()
      assert(lines == Seq("tick.eur 1.09", "trade.usd done"))
    } finally relay.close()
  }

  test("PUB endpoint to SUB relay composition delivers with server-side " +
      "subscription filtering") {
    import graft.streaming.{ZmtpPub, ZmtpRelay}
    val pub = ZmtpPub.bind()
    val relay = ZmtpRelay.start("localhost", pub.port, topics = Seq("tick."))
    try {
      // line reader must be attached before publishing (relay broadcasts
      // only to connected clients)
      val client = new java.net.Socket("localhost", relay.localPort)
      client.setSoTimeout(10000)
      Thread.sleep(300) // acceptor registration
      assert(pub.awaitSubscribers(1), "SUB handshake never completed")
      pub.publish(Seq("tick.eur 1.09".getBytes(UTF_8)))
      pub.publish(Seq("trade.usd done".getBytes(UTF_8))) // filtered at PUB
      pub.publish(Seq("tick.gbp 1.27".getBytes(UTF_8)))
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(client.getInputStream, UTF_8))
      assert(Seq(reader.readLine(), reader.readLine()) ==
        Seq("tick.eur 1.09", "tick.gbp 1.27"))
      client.close()
    } finally { relay.close(); pub.close() }
  }

  test("decoded messages drive zmqFrames' topic filter unchanged") {
    // the codec's line bridge feeds the existing dataflow: same split,
    // same subscribe-prefix semantics
    val line = Zmtp.messageToLine(
      Seq("tick.eur".getBytes(UTF_8), "1.09 bid".getBytes(UTF_8)))
    assert(line == "tick.eur 1.09 bid")
  }
}
