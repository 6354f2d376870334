package graft.streaming

import java.net.{ServerSocket, Socket}

/** ZMTP 3.0 PUB endpoint, pure JVM — the write-side counterpart of
  * [[ZmtpRelay]]: binds a port, handshakes each connecting SUB peer
  * (greeting + READY, NULL mechanism), tracks its subscriptions
  * ([[Zmtp.Subscriptions]], refcounted prefix matching), and fans
  * published messages out to the peers whose subscriptions accept them.
  * Backs zmq-mode SOCKET_WRITE: each tuple line publishes as one frame,
  * so a SUB peer's prefix filter applies to the start of the payload —
  * the same contract [[Streams.zmqFrames]] applies on the read side.
  *
  * PUB/SUB slow-joiner caveat (inherent to the pattern, same as libzmq):
  * messages published before a subscriber's handshake+subscribe complete
  * are not delivered to it. [[Pub.awaitSubscribers]] exists so tests and
  * coordinated pipelines can gate on readiness.
  */
object ZmtpPub {

  private final class Peer(val socket: Socket) {
    val subs = new Zmtp.Subscriptions
    @volatile var ready = false // greeting + READY seen
    val out: java.io.OutputStream = socket.getOutputStream
  }

  final class Pub private[ZmtpPub] (server: ServerSocket) extends AutoCloseable {
    def port: Int = server.getLocalPort
    private val peers =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Peer]()
    @volatile private var closed = false

    private[ZmtpPub] def acceptLoop(): Unit =
      try while (!closed) {
        val s = server.accept()
        val peer = new Peer(s)
        peers.add(peer)
        val t = new Thread(() => {
          try {
            peer.out.write(Zmtp.greeting())
            peer.out.write(Zmtp.encodeFrame(Zmtp.ready("PUB")))
            peer.out.flush()
            val dec = new Zmtp.Decoder
            val buf = new Array[Byte](4096)
            val in = s.getInputStream
            var n = in.read(buf)
            while (n >= 0 && !closed) {
              dec.feed(java.util.Arrays.copyOf(buf, n)).foreach {
                case Zmtp.CommandEvent("READY", _) => peer.ready = true
                // subscribe/cancel arrive as 0x01/0x00-prefixed messages
                case Zmtp.MessageEvent(parts) if parts.nonEmpty =>
                  peer.subs.feed(parts.head)
                case _ => ()
              }
              n = in.read(buf)
            }
          } catch {
            case _: java.io.IOException | _: IllegalStateException |
                 _: IllegalArgumentException => ()
          } finally {
            peers.remove(peer)
            try s.close() catch { case _: Exception => () }
          }
        }, "zmtp-pub-peer")
        t.setDaemon(true); t.start()
      } catch { case _: java.io.IOException => () } // server closed

    /** Publish one message; `parts.head` is the topic the peers' prefix
      * subscriptions match against (for single-frame messages that is the
      * whole payload — same rule libzmq applies). */
    def publish(parts: Seq[Array[Byte]]): Unit = {
      require(parts.nonEmpty, "empty message")
      val topic = new String(parts.head,
        java.nio.charset.StandardCharsets.UTF_8)
      peers.forEach { p =>
        if (p.ready && p.subs.accepts(topic)) {
          try {
            parts.init.foreach(b =>
              p.out.write(Zmtp.encodeFrame(Zmtp.Frame(b, more = true))))
            p.out.write(Zmtp.encodeFrame(Zmtp.Frame(parts.last)))
            p.out.flush()
          } catch { case _: java.io.IOException =>
            peers.remove(p)
            try p.socket.close() catch { case _: Exception => () }
          }
        }
      }
    }

    /** Block until at least `n` peers have completed the handshake AND
      * hold at least one active subscription, or the timeout elapses.
      * Returns whether the condition was met. */
    def awaitSubscribers(n: Int, timeoutMs: Long = 10000L): Boolean = {
      val deadline = System.currentTimeMillis() + timeoutMs
      def count = {
        var c = 0
        peers.forEach(p => if (p.ready && p.subs.active.nonEmpty) c += 1)
        c
      }
      while (count < n && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      count >= n
    }

    override def close(): Unit = {
      closed = true
      try server.close() catch { case _: Exception => () }
      peers.forEach(p =>
        try p.socket.close() catch { case _: Exception => () })
      peers.clear()
    }
  }

  /** Bind a PUB endpoint (port 0 = ephemeral) and start accepting SUB
    * peers. */
  def bind(port: Int = 0): Pub = {
    val pub = new Pub(new ServerSocket(port))
    val t = new Thread(() => pub.acceptLoop(), "zmtp-pub-accept")
    t.setDaemon(true); t.start()
    pub
  }
}
