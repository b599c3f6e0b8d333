package graft.llm

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

/** Multi-host global rate limiting: a tiny TCP token-bucket daemon plus a
  * [[GlobalBucket]] client — the network-coordinated leg of the
  * reference's scope-key design (ondine/utils/redis_rate_limiter.py: N
  * workers, possibly on N hosts, one API key, ONE logical bucket keyed by
  * scope). Where the reference scripts Redis (atomic token state under a
  * scope key, TTL'd penalty), this serves the same semantics from one
  * JVM-hosted daemon; swapping the daemon for Redis is a transport change
  * only — the protocol below maps 1:1 onto the reference's Lua script:
  *
  *   ACQUIRE <scope> <rpm> <burst>  →  OK | RETRY <sleepMs>
  *   PENALIZE <scope> <rpm> <burst> <delayMs>  →  OK
  *
  * (ACQUIRE = the script's read-refill-take-or-report, RETRY carries the
  * server-computed wait so clients don't busy-poll; PENALIZE = the
  * penalty-deadline SET. The first request for a scope creates its bucket,
  * like Redis key auto-creation.)
  *
  * Deployment shape at 100 TB: run one daemon next to the driver (or any
  * stable host); every executor JVM's ClientPool builds a [[SocketBucket]]
  * with the same (host, port, scope) — the aggregate request rate across
  * the whole cluster then honors ONE rpm, exactly, including 429
  * retry-after penalties observed by any single executor.
  */
object TokenBucketServer {

  /** One scope's state — the same arithmetic as [[RateLimiter]], but with
    * a non-blocking probe: callers never park threads in the daemon. */
  private final class Bucket(rpm: Int, burst: Int) {
    private val ratePerMs: Double = rpm / 60000.0
    private val capacity: Double = math.max(1, burst).toDouble
    private var tokens: Double = capacity
    private var lastRefillMs: Long = System.nanoTime() / 1000000L
    private var penaltyUntilMs: Long = 0L

    /** 0 = token taken; >0 = suggested wait in ms. */
    def tryAcquire(): Long = synchronized {
      val now = System.nanoTime() / 1000000L
      val elapsed = now - lastRefillMs
      if (elapsed > 0) {
        tokens = math.min(capacity, tokens + elapsed * ratePerMs)
        lastRefillMs = now
      }
      if (now < penaltyUntilMs) penaltyUntilMs - now
      else if (tokens >= 1.0) { tokens -= 1.0; 0L }
      else math.max(1L, math.ceil((1.0 - tokens) / ratePerMs).toLong)
    }

    def penalize(delayMs: Long): Unit = synchronized {
      val now = System.nanoTime() / 1000000L
      penaltyUntilMs = math.max(penaltyUntilMs, now + delayMs)
      tokens = 0.0
      lastRefillMs = now
    }
  }

  /** A running daemon; `close()` stops it. Thread-per-connection is fine
    * at this scale — connections are one per executor JVM, not per call. */
  final class Server private[TokenBucketServer] (server: ServerSocket)
    extends AutoCloseable {
    private val buckets = new ConcurrentHashMap[String, Bucket]()
    @volatile private var running = true

    def port: Int = server.getLocalPort

    private[TokenBucketServer] def start(): this.type = {
      val acceptor = new Thread(() => {
        while (running) {
          try {
            val sock = server.accept()
            val t = new Thread(() => serve(sock), "graft-bucket-conn")
            t.setDaemon(true)
            t.start()
          } catch { case _: java.io.IOException => /* closed */ }
        }
      }, "graft-bucket-accept")
      acceptor.setDaemon(true)
      acceptor.start()
      this
    }

    /** Keyed by (scope, rpm, burst): a second client naming the same
      * scope with a DIFFERENT config gets its own bucket instead of
      * silently inheriting the first caller's rate (the same coherence
      * rule as ClientPool's config-folded singleton keys). */
    private def bucket(scope: String, rpm: Int, burst: Int): Bucket =
      buckets.computeIfAbsent(s"$scope:$rpm:$burst",
        _ => new Bucket(rpm, burst))

    private def serve(sock: Socket): Unit = {
      try {
        sock.setTcpNoDelay(true)
        val in = new BufferedReader(new InputStreamReader(
          sock.getInputStream, StandardCharsets.UTF_8))
        val out = new PrintWriter(
          new java.io.OutputStreamWriter(
            sock.getOutputStream, StandardCharsets.UTF_8), true)
        var line = in.readLine()
        while (line != null) {
          val parts = line.trim.split(" ")
          val reply = parts(0) match {
            case "ACQUIRE" if parts.length == 4 =>
              val wait = bucket(parts(1), parts(2).toInt, parts(3).toInt)
                .tryAcquire()
              if (wait == 0L) "OK" else s"RETRY $wait"
            case "PENALIZE" if parts.length == 5 =>
              bucket(parts(1), parts(2).toInt, parts(3).toInt)
                .penalize(parts(4).toLong)
              "OK"
            case _ => "ERR bad request"
          }
          out.println(reply)
          line = in.readLine()
        }
      } catch {
        case _: java.io.IOException => // client went away; its tokens stand
      } finally sock.close()
    }

    def close(): Unit = { running = false; server.close() }
  }

  /** Start a daemon on `port` (0 = ephemeral, read back via `.port`). */
  def start(port: Int = 0): Server =
    new Server(new ServerSocket(port, 64,
      java.net.InetAddress.getByName("0.0.0.0"))).start()
}

/** [[GlobalBucket]] client of a [[TokenBucketServer]]: blocks locally on
  * RETRY (the daemon never parks threads), retries the wire on connection
  * loss. One persistent connection per instance; calls serialize on it —
  * matching ClientPool's one-bucket-per-executor shape.
  */
final class SocketBucket(host: String, port: Int, scope: String,
                         requestsPerMinute: Int, burst: Int)
  extends GlobalBucket with AutoCloseable {
  require(requestsPerMinute > 0)

  private var sock: Socket = _
  private var in: BufferedReader = _
  private var out: PrintWriter = _

  private def ensureConnected(): Unit = {
    if (sock == null || sock.isClosed) {
      sock = new Socket()
      sock.setTcpNoDelay(true)
      sock.connect(new InetSocketAddress(host, port), 5000)
      in = new BufferedReader(new InputStreamReader(
        sock.getInputStream, StandardCharsets.UTF_8))
      out = new PrintWriter(new java.io.OutputStreamWriter(
        sock.getOutputStream, StandardCharsets.UTF_8), true)
    }
  }

  /** One request/reply on the persistent connection, reconnecting up to
    * 3 times. A reconnect after a sent-but-unanswered command may repeat
    * it server-side (at-least-once): for ACQUIRE that forfeits at most
    * one token, for PENALIZE the max() makes repeats idempotent — both
    * err on the throttled side, never over the rate. */
  private def roundTrip(cmd: String): String = synchronized {
    var lastErr: java.io.IOException = null
    (0 until 3).foreach { _ =>
      try {
        ensureConnected()
        out.println(cmd)
        val reply = in.readLine()
        if (reply == null) throw new java.io.IOException("daemon closed connection")
        return reply
      } catch {
        case e: java.io.IOException =>
          lastErr = e
          try if (sock != null) sock.close() catch { case _: Exception => () }
          sock = null
      }
    }
    throw new NetworkError(s"rate-limit daemon unreachable at $host:$port: $lastErr")
  }

  def acquire(): Long = {
    var waited = 0L
    while (true) {
      roundTrip(s"ACQUIRE $scope $requestsPerMinute $burst") match {
        case "OK" => return waited
        case r if r.startsWith("RETRY ") =>
          val ms = r.substring(6).toLong
          Thread.sleep(math.min(ms, 100L))
          waited += ms
        case other =>
          throw new NetworkError(s"rate-limit daemon protocol error: $other")
      }
    }
    waited
  }

  def penalize(delayMs: Long): Unit = {
    roundTrip(s"PENALIZE $scope $requestsPerMinute $burst $delayMs") match {
      case "OK" => ()
      case other =>
        throw new NetworkError(s"rate-limit daemon protocol error: $other")
    }
  }

  def close(): Unit = if (sock != null) sock.close()
}
