package graft

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable

/** Minimal in-process RESP2 server for [[graft.llm.RedisBucket]] tests —
  * the loopback discipline of HttpLlmClientSpec applied to Redis: the
  * client speaks the REAL wire protocol (RESP arrays, EVALSHA/EVAL with
  * NOSCRIPT fallback) against a fake that holds a single-threaded
  * keyspace, exactly like Redis's one command at a time execution model.
  *
  * Lua itself is not interpreted: the two graft scripts are recognized by
  * their `-- graft:acquire` / `-- graft:penalize` marker comments and
  * their documented semantics are executed natively under the store lock
  * (the fakeredis test-double discipline). An unknown SHA gets a real
  * `-NOSCRIPT` error so the client's EVAL fallback is exercised on every
  * fresh server.
  */
final class MiniRedis(bindPort: Int = 0) extends AutoCloseable {
  private val server = new ServerSocket(bindPort, 16,
    java.net.InetAddress.getByName("127.0.0.1"))
  @volatile private var running = true
  val commandsServed = new AtomicLong(0L)

  def port: Int = server.getLocalPort

  // keyspace: string values and hash values, both with optional expiry
  private val strings = mutable.Map.empty[String, String]
  private val hashes = mutable.Map.empty[String, mutable.Map[String, String]]
  private val expiries = mutable.Map.empty[String, Long] // absolute ms
  private val scripts = mutable.Map.empty[String, String] // sha -> source
  private val lock = new Object

  private def expired(key: String): Boolean =
    expiries.get(key).exists(_ <= System.currentTimeMillis())
  private def sweep(key: String): Unit =
    if (expired(key)) { strings.remove(key); hashes.remove(key); expiries.remove(key) }

  {
    val t = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          val h = new Thread(() => serve(s), "mini-redis-conn")
          h.setDaemon(true); h.start()
        } catch { case _: java.io.IOException => () }
      }
    }, "mini-redis-accept")
    t.setDaemon(true); t.start()
  }

  private def serve(sock: Socket): Unit = {
    try {
      sock.setTcpNoDelay(true)
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      while (true) {
        val cmd = graft.llm.RedisBucket.parse(in) match {
          case a: Array[_] => a.map(_.asInstanceOf[String]).toSeq
          case other => throw new java.io.IOException(s"bad command: $other")
        }
        commandsServed.incrementAndGet()
        val reply = lock.synchronized(dispatch(cmd))
        out.write(reply.getBytes(StandardCharsets.UTF_8))
        out.flush()
      }
    } catch {
      case _: java.io.IOException => ()
      case _: graft.llm.RedisBucket.ErrorReply => ()
    } finally sock.close()
  }

  private def bulk(s: String): String =
    if (s == null) "$-1\r\n" else s"$$${s.getBytes(StandardCharsets.UTF_8).length}\r\n$s\r\n"

  private def dispatch(cmd: Seq[String]): String = cmd.head.toUpperCase match {
    case "SCRIPT" if cmd(1).equalsIgnoreCase("LOAD") =>
      val sha = graft.llm.RedisBucket.sha1Hex(cmd(2))
      scripts(sha) = cmd(2)
      bulk(sha)
    case "EVAL" =>
      val sha = graft.llm.RedisBucket.sha1Hex(cmd(1))
      scripts(sha) = cmd(1)
      runScript(cmd(1), cmd.drop(2))
    case "EVALSHA" =>
      scripts.get(cmd(1)) match {
        case Some(src) => runScript(src, cmd.drop(2))
        case None => "-NOSCRIPT No matching script\r\n"
      }
    case "DEL" =>
      var n = 0
      cmd.tail.foreach { k =>
        if (strings.remove(k).isDefined || hashes.remove(k).isDefined) n += 1
        expiries.remove(k)
      }
      s":$n\r\n"
    case "GET" =>
      sweep(cmd(1)); bulk(strings.get(cmd(1)).orNull)
    case "SET" =>
      // SET key value [PX ms] — the response-cache store shape
      strings(cmd(1)) = cmd(2)
      expiries.remove(cmd(1))
      val px = cmd.indexWhere(_.equalsIgnoreCase("PX"))
      if (px >= 3 && cmd.length > px + 1)
        expiries(cmd(1)) = System.currentTimeMillis() + cmd(px + 1).toLong
      "+OK\r\n"
    case other => s"-ERR unknown command '$other'\r\n"
  }

  /** Execute a recognized graft script's semantics atomically. */
  private def runScript(src: String, rest: Seq[String]): String = {
    val numKeys = rest.head.toInt
    val keys = rest.slice(1, 1 + numKeys)
    val args = rest.drop(1 + numKeys)
    if (src.startsWith("-- graft:acquire")) {
      val Seq(bucketKey, penaltyKey) = keys
      val rate = args(0).toDouble; val cap = args(1).toDouble
      val want = args(2).toDouble; var now = args(3).toDouble
      val ttlMs = args(4).toLong
      sweep(penaltyKey); sweep(bucketKey)
      val pen = strings.get(penaltyKey).map(_.toDouble)
      if (pen.exists(now < _)) return s"*2\r\n:0\r\n${bulk("0")}"
      val h = hashes.get(bucketKey)
      var tok = h.flatMap(_.get("tok")).map(_.toDouble).getOrElse(cap)
      val at = h.flatMap(_.get("at")).map(_.toDouble).getOrElse(now)
      var dt = now - at
      if (dt < 0) { dt = 0; now = at }
      tok = math.min(cap, tok + dt * rate)
      val granted = want <= 0 || tok >= want
      if (granted) tok -= want
      hashes(bucketKey) = mutable.Map("tok" -> tok.toString,
        "at" -> String.format(java.util.Locale.ROOT, "%.6f", Double.box(now)))
      expiries(bucketKey) = System.currentTimeMillis() + ttlMs
      s"*2\r\n:${if (granted) 1 else 0}\r\n${bulk(tok.toString)}"
    } else if (src.startsWith("-- graft:penalize")) {
      val penaltyKey = keys.head
      val cand = args(0).toDouble; val ttlMs = args(1).toLong
      sweep(penaltyKey)
      val cur = strings.get(penaltyKey).map(_.toDouble)
      if (cur.forall(cand > _)) {
        strings(penaltyKey) = cand.toString
        expiries(penaltyKey) = System.currentTimeMillis() + ttlMs
      }
      ":1\r\n"
    } else "-ERR unrecognized script\r\n"
  }

  def close(): Unit = { running = false; server.close() }
}
