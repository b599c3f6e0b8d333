package graft

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm._

/** Table-driven parity check of the error taxonomy against the
  * reference's classifier (llm_invocation_stage.py:581-636): every row of
  * the reference table — network/timeout/connection/503/502 retryable;
  * quota/billing, auth, model-not-found non-retryable; rate retryable —
  * is served through a real loopback HTTP exchange and must map to the
  * same class and retryability, so drift between the two tables can't
  * creep in silently.
  *
  * One deliberate deviation, asserted at the bottom: the reference's bare
  * "limit exceeded" quota pattern also matches the standard "rate limit
  * exceeded" 429 body (quota is checked before rate there), which would
  * turn an ordinary throttle into a fatal error. Here quota needs an
  * explicit quota/billing marker.
  */
class ErrorTaxonomySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = _
  // the handler serves whatever the current case sets
  @volatile private var status = 200
  @volatile private var body = "{}"

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1", (ex: HttpExchange) => {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      val os: OutputStream = ex.getResponseBody
      os.write(bytes); os.close()
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = server.stop(0)

  private def client = new HttpLlmClient(
    s"http://127.0.0.1:$port/v1", "m", timeoutMs = 5000L)

  /** (reference row, HTTP status, body, expected class, retryable) */
  private case class Case(row: String, status: Int, body: String,
                          expected: Class[_ <: LlmError],
                          retryable: Boolean)

  private val table = Seq(
    // network errors (retryable) — llm_invocation_stage.py:600-604
    Case("503", 503, """{"error":"service unavailable"}""",
      classOf[NetworkError], retryable = true),
    Case("502", 502, """{"error":"bad gateway"}""",
      classOf[NetworkError], retryable = true),
    // quota errors (non-retryable) — :606-615
    Case("quota exceeded", 429,
      """{"error":{"message":"You exceeded your current quota"}}""",
      classOf[QuotaError], retryable = false),
    Case("insufficient_quota", 429,
      """{"error":{"code":"insufficient_quota"}}""",
      classOf[QuotaError], retryable = false),
    Case("billing", 402,
      """{"error":{"message":"billing hard limit reached"}}""",
      classOf[QuotaError], retryable = false),
    // rate limit (retryable) — :617-619
    Case("rate/429", 429,
      """{"error":{"message":"Rate limit reached, retry shortly"}}""",
      classOf[RateLimitError], retryable = true),
    // auth errors (non-retryable) — :621-624
    Case("401", 401, """{"error":"bad key"}""",
      classOf[AuthError], retryable = false),
    Case("403", 403, """{"error":"forbidden"}""",
      classOf[AuthError], retryable = false),
    Case("invalid api key", 400,
      """{"error":{"message":"Invalid API key provided"}}""",
      classOf[AuthError], retryable = false),
    Case("unauthorized", 400,
      """{"error":{"message":"unauthorized for this org"}}""",
      classOf[AuthError], retryable = false),
    // model errors (non-retryable on a single client) — :626-635
    Case("decommissioned", 400,
      """{"error":{"message":"model gpt-x has been decommissioned"}}""",
      classOf[ModelNotFoundError], retryable = false),
    Case("not found", 404,
      """{"error":{"message":"The model 'zzz' was not found"}}""",
      classOf[ModelNotFoundError], retryable = false),
    Case("does not exist", 404,
      """{"error":{"message":"model does not exist"}}""",
      classOf[ModelNotFoundError], retryable = false),
    Case("invalid model", 400,
      """{"error":{"message":"invalid model id"}}""",
      classOf[ModelNotFoundError], retryable = false),
    // residual 4xx stays a generic non-retryable LlmError
    Case("other 4xx", 400, """{"error":"malformed request"}""",
      classOf[LlmError], retryable = false))

  test("every reference taxonomy row maps to the same class and retryability") {
    table.foreach { c =>
      status = c.status; body = c.body
      val thrown = intercept[LlmError](client.invoke("p", None))
      assert(thrown.getClass == c.expected,
        s"row '${c.row}': got ${thrown.getClass.getSimpleName}, " +
          s"want ${c.expected.getSimpleName} ($thrown)")
      assert(thrown.retryable == c.retryable,
        s"row '${c.row}': retryable=${thrown.retryable}, want ${c.retryable}")
    }
  }

  test("deliberate deviation: 'rate limit exceeded' stays a retryable throttle") {
    // the reference's bare "limit exceeded" quota pattern (checked before
    // rate) would classify this standard 429 wording as fatal quota
    status = 429
    body = """{"error":{"message":"rate limit exceeded, slow down"}}"""
    val thrown = intercept[LlmError](client.invoke("p", None))
    assert(thrown.getClass == classOf[RateLimitError] && thrown.retryable)
  }

  test("router fails over past a model error (the reference's router remap)") {
    // reference: with a router configured, model errors become retryable
    // so the next deployment is tried; RouterClient reaches the same
    // outcome by failing over on any non-rate-limit LlmError
    val dead = new LlmClient {
      val model = "dead"
      def invoke(p: String, s: Option[String]) =
        throw new ModelNotFoundError("model 'dead' has been decommissioned")
    }
    val alive = new MockLlmClient()
    val router = new RouterClient(Seq(dead -> 1e6, alive -> 1e-6))
    val r = router.invoke("hello", None)
    assert(r.text.nonEmpty, "router must fail over past the dead model")
  }
}
