package graft

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm._

/** Drives HttpLlmClient through a real socket against an in-process
  * loopback server (zero egress): success + usage→cost, 429/Retry-After →
  * RateLimitError healed by RetryHandler, 5xx retryable, 401 fatal,
  * malformed 200, and connection-refused → NetworkError.
  */
class HttpLlmClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = _
  private val calls429 = new AtomicInteger(0)
  private val calls500 = new AtomicInteger(0)
  @volatile private var lastAuth: String = null
  @volatile private var lastBody: String = null

  private def respond(ex: HttpExchange, status: Int, body: String,
                      headers: Map[String, String] = Map.empty): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.sendResponseHeaders(status, bytes.length)
    val os: OutputStream = ex.getResponseBody
    os.write(bytes); os.close()
  }

  private def okBody(content: String, tIn: Int, tOut: Int): String =
    s"""{"model":"served-model","choices":[{"message":{"role":"assistant",
       |"content":"$content"}}],"usage":{"prompt_tokens":$tIn,
       |"completion_tokens":$tOut}}""".stripMargin.replace("\n", "")

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ok", (ex: HttpExchange) => {
      lastAuth = ex.getRequestHeaders.getFirst("Authorization")
      lastBody = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      respond(ex, 200, okBody("pong", 100, 25))
    })
    server.createContext("/flaky429", (ex: HttpExchange) => {
      if (calls429.incrementAndGet() <= 2)
        respond(ex, 429, """{"error":"slow down"}""",
          Map("Retry-After" -> "0"))
      else respond(ex, 200, okBody("recovered", 10, 5))
    })
    server.createContext("/flaky500", (ex: HttpExchange) => {
      if (calls500.incrementAndGet() == 1)
        respond(ex, 500, "internal meltdown")
      else respond(ex, 200, okBody("healed", 10, 5))
    })
    server.createContext("/denied", (ex: HttpExchange) =>
      respond(ex, 401, """{"error":"bad key"}"""))
    server.createContext("/teapot", (ex: HttpExchange) =>
      respond(ex, 418, "short and stout"))
    server.createContext("/garbage", (ex: HttpExchange) =>
      respond(ex, 200, "this is not json"))
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = server.stop(0)

  private def client(path: String) = new HttpLlmClient(
    s"http://127.0.0.1:$port$path", "test-model",
    apiKey = Some("sk-test"),
    inPer1k = BigDecimal("0.001"), outPer1k = BigDecimal("0.002"),
    timeoutMs = 5000)

  test("success: content, served model, usage-driven Decimal cost, auth header") {
    val r = client("/ok").invoke("hello world", Some("be terse"))
    assert(r.text == "pong")
    assert(r.model == "served-model")
    assert(r.tokensIn == 100 && r.tokensOut == 25)
    // 100/1000*0.001 + 25/1000*0.002 = 0.0001 + 0.00005
    assert(r.cost.compareTo(new java.math.BigDecimal("0.00015")) == 0)
    assert(lastAuth == "Bearer sk-test")
    assert(lastBody.contains(""""role":"system""""))
    assert(lastBody.contains(""""content":"hello world""""))
    assert(r.latencyMs > 0)
  }

  test("429 maps to RateLimitError with Retry-After and heals under RetryHandler") {
    calls429.set(0)
    val c = client("/flaky429")
    val direct = intercept[RateLimitError](c.invoke("x", None))
    assert(direct.retryAfterMs.contains(0L))
    calls429.set(0)
    val r = RetryHandler.withRetries(maxRetries = 3, baseMs = 1, capMs = 10,
      limiter = None)(c.invoke("x", None))
    assert(r.text == "recovered")
    assert(calls429.get() == 3) // two 429s then success
  }

  test("5xx is retryable, one retry heals it") {
    calls500.set(0)
    val r = RetryHandler.withRetries(3, 1, 10, None)(
      client("/flaky500").invoke("x", None))
    assert(r.text == "healed")
    assert(calls500.get() == 2)
  }

  test("401 is a non-retryable AuthError") {
    intercept[AuthError](client("/denied").invoke("x", None))
  }

  test("unexpected 4xx is a non-retryable LlmError") {
    val e = intercept[LlmError](client("/teapot").invoke("x", None))
    assert(!e.retryable)
    assert(e.getMessage.contains("418"))
  }

  test("unparseable 200 body is a retryable NetworkError") {
    val e = intercept[NetworkError](client("/garbage").invoke("x", None))
    assert(e.retryable)
  }

  test("slow response past the deadline is a retryable NetworkError") {
    server.createContext("/slow", (ex: HttpExchange) => {
      Thread.sleep(5000)
      respond(ex, 200, okBody("too late", 1, 1))
    })
    val fast = new HttpLlmClient(s"http://127.0.0.1:$port/slow", "m",
      timeoutMs = 300)
    val t0 = System.nanoTime()
    val e = intercept[NetworkError](fast.invoke("x", None))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(e.retryable && e.getMessage.contains("timed out"))
    assert(ms < 4000, s"deadline not enforced, took ${ms}ms")
  }

  test("connection refused is a retryable NetworkError") {
    val dead = new HttpLlmClient("http://127.0.0.1:1/nothing", "m",
      timeoutMs = 1000)
    val e = intercept[NetworkError](dead.invoke("x", None))
    assert(e.retryable)
  }
}
